package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.TimeRangeExtract.TimeRange

/**
 * The query engine: the Spark analog of the reference's
 * `QueryClient.Query` lifecycle (/root/reference/querier/queryClient.go:713-877):
 *
 *   normalize → SHOW intercepts → parse (Catalyst, not regexes) →
 *   catalog file pruning by extracted time range → register pruned
 *   scan as temp view → run the user SQL → fallback pass-through for
 *   table-free SQL.
 *
 * Differences from the reference, by design (documented quirk fixes):
 *  - an empty pruned file set yields an empty DataFrame with the
 *    table's schema instead of an error (quirk §2.3-6);
 *  - the plan-based time extraction replaces 16 regexes (O2) and the
 *    FROM-rewrite string surgery (O8) becomes temp-view registration.
 */
class Engine(val spark: SparkSession, val catalog: CatalogBackend,
             val defaultDb: String = "mydb", val timeCol: String = "time") {

  graft.functions.Compat.register(spark)
  Tables.configure(spark)

  import TimeRangeExtract._

  def showDatabases(): DataFrame = {
    import spark.implicits._
    catalog.databases.toDF("database_name")
  }

  def showTables(db: String): DataFrame = {
    import spark.implicits._
    catalog.tables(db).toDF("table_name")
  }

  /** Read a table from its (optionally time-pruned) file list. */
  def readTable(db: String, table: String, range: Option[(Long, Long)]): DataFrame = {
    val paths = catalog.prunedPaths(db, table, range)
    if (paths.nonEmpty) {
      // union_by_name=true analog: schema-evolving multi-file scan with
      // DuckDB-style type widening (Tables.readEvolving)
      Tables.readEvolving(spark, paths)
    } else {
      val all = catalog.prunedPaths(db, table, None)
      if (all.isEmpty) spark.emptyDataFrame
      else { // empty result with the table's real schema (quirk §2.3-6 fix)
        val schema = Tables.readEvolving(spark, all).schema
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      }
    }
  }

  /**
   * Execute a query against the lake. `db` resolution mirrors the
   * reference: explicit argument > default "mydb"
   * (/root/reference/querier/server.go:183-189).
   */
  def query(sql0: String, db0: String = ""): DataFrame = {
    val sql = sql0.trim.replaceAll("\\s+", " ")
    val db = if (db0.nonEmpty) db0 else defaultDb
    val upper = sql.toUpperCase.stripSuffix(";").trim
    if (upper == "SHOW DATABASES") return showDatabases()
    if (upper == "SHOW TABLES") return showTables(db)

    val planOpt = scala.util.Try(parse(spark, sql)).toOption
    val rels = planOpt.map(findRelations).getOrElse(Nil)
      .map {
        case Seq(d, t) => (d, t)
        case Seq(t) => (db, t)
        case other => (other.dropRight(1).mkString("."), other.last)
      }
      .filter { case (d, t) => catalog.tableExists(d, t) }
    if (rels.isEmpty)
      return spark.sql(sql) // table-free or non-lake SQL → pass-through (O10)

    // register EVERY referenced lake table as a temp view (joins across
    // measurements work like any single-table query). Zone-map pruning
    // is alias-aware: `m.time >= …` tightens only the relation aliased
    // `m`; unqualified `time` predicates attribute only in
    // single-relation queries. Mis-attribution would drop rows; the
    // WHERE clause still filters either way (quirk §2.3-7).
    val perRel: Map[String, TimeRange] =
      extractPerRelation(planOpt.get, timeCol)
    var anyLongTime = false
    rels.foreach { case (relDb, table) =>
      val pruneRange = perRel.get(table.toLowerCase).flatMap(_.asTuple)
      val tableDf = readTable(relDb, table, pruneRange)
      tableDf.createOrReplaceTempView(table)
      anyLongTime ||= tableDf.schema.fields
        .find(_.name.equalsIgnoreCase(timeCol))
        .exists(_.dataType == org.apache.spark.sql.types.LongType)
    }
    // `db.table` → `table` (the view) on the PARSED PLAN — the analog
    // of the reference's FROM-clause splice (O8), but done as an
    // identifier transform instead of regex surgery over the SQL text,
    // so a 'mydb.meas' string literal or a column named `mydb` is
    // never corrupted. Subquery plans are rewritten too.
    val registered = rels.map { case (d, t) => (d.toLowerCase, t.toLowerCase) }.toSet
    val renamed = planOpt.get.transformDownWithSubqueries {
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
          if r.multipartIdentifier.size >= 2 && registered.contains(
            (r.multipartIdentifier.dropRight(1).mkString(".").toLowerCase,
              r.multipartIdentifier.last.toLowerCase)) =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedRelation(
          Seq(r.multipartIdentifier.last))
    }
    // O9 analog: if any time column is int64 ns, rewrite time-vs-
    // string/timestamp literal comparisons to long-literal form
    val finalPlan =
      if (anyLongTime) rewriteTimeLiterals(renamed, timeCol) else renamed
    org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(spark, finalPlan)
  }
}
