package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Test-lake table access.
 *
 * The reference engine's `time` contract is int64 epoch-nanoseconds
 * (see /root/reference/querier/queryClient.go:32,314 — literals are
 * rewritten to `epoch_ns(...)` so they compare against an int64 column).
 * Spark's TimestampType is microseconds and rejects parquet NANOS
 * columns outright, so we read nanosecond timestamp columns as raw
 * LongType (`spark.sql.legacy.parquet.nanosAsLong`) — full fidelity,
 * matching the reference's own representation.
 */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session configs every graft read path wants; all runtime-settable. */
  def configure(spark: SparkSession): Unit = {
    // events.ts is TIMESTAMP(NANOS) — read as int64 ns, the reference's contract.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Write µs-int64 timestamps (not INT96) so the oracle compare sees
    // identical logical values to DuckDB's TIMESTAMP results.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view (for the SQL-form queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
