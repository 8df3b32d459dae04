package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-style pricing summary (the reference's canonical aggregate is
    * `SELECT count(*), avg(temperature) FROM weather` — README.md:76). */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.TimeSeries.queries ++
      graft.queries.Pipeline.queries ++ graft.queries.Coverage.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approx sketches, hash-specific dedup) → rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++ graft.queries.TimeSeries.oracleSql ++
      graft.queries.Pipeline.oracleSql ++ graft.queries.Coverage.oracleSql
}
