package graft

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Catalog zone-map pruning (FIXTURES.md A4) + Engine end-to-end on a
 * fixture lake with an int64-ns `time` column.
 */
class CatalogEngineSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  private val HOUR_NS = 3600L * 1000000000L
  private val T0 = 1672531200000000000L // 2023-01-01T00:00:00Z

  /** Lake: mydb/meas/date=d/part.parquet + metadata.json, plus tmp/ junk. */
  private lazy val root: String = {
    val dir = Files.createTempDirectory(
      new File("target").toPath.toAbsolutePath, "lake").toFile
    import spark.implicits._
    def writeDay(day: Int): Unit = {
      val d = new File(dir, f"mydb/meas/date=2023-01-${day}%02d")
      d.mkdirs()
      val t0 = T0 + (day - 1) * 24 * HOUR_NS
      val rows = (0 until 24).map(h => (t0 + h * HOUR_NS, s"loc$day", day * 100.0 + h))
      rows.toDF("time", "location", "temperature").coalesce(1)
        .write.mode("overwrite").parquet(d.getAbsolutePath)
      // rename part file + write folder metadata.json
      val part = d.listFiles().find(_.getName.endsWith(".parquet")).get
      val tgt = new File(d, "part0.parquet")
      part.renameTo(tgt)
      d.listFiles().filter(f => f.getName.startsWith("_") || f.getName.endsWith(".crc"))
        .foreach(_.delete())
      val (mn, mx) = (rows.map(_._1).min, rows.map(_._1).max)
      Files.writeString(new File(d, "metadata.json").toPath,
        s"""{"type":"parquet","row_count":24,"min_time":$mn,"max_time":$mx,
           |"files":[{"path":"part0.parquet","row_count":24,"min_time":$mn,"max_time":$mx}]}"""
          .stripMargin)
    }
    (1 to 3).foreach(writeDay)
    val tmp = new File(dir, "mydb/meas/tmp"); tmp.mkdirs()
    Files.writeString(new File(tmp, "half.parquet").toPath, "junk")
    dir.getAbsolutePath
  }

  private lazy val catalog = new Catalog(root)
  private lazy val engine = new Engine(spark, catalog)

  test("databases / tables discovery") {
    assert(catalog.databases == Seq("mydb"))
    assert(catalog.tables("mydb") == Seq("meas"))
  }

  test("tmp/ dirs are skipped; all real files listed without range") {
    val fs = catalog.files("mydb", "meas")
    assert(fs.size == 3)
    assert(fs.forall(!_.path.contains("/tmp/")))
  }

  test("zone-map pruning selects exactly overlapping files") {
    // range = day 2 only
    val lo = T0 + 24 * HOUR_NS
    val hi = T0 + 47 * HOUR_NS
    val fs = catalog.files("mydb", "meas", Some((lo, hi)))
    assert(fs.size == 1 && fs.head.path.contains("date=2023-01-02"))
    // range spanning day 2-3 boundary
    assert(catalog.files("mydb", "meas", Some((hi, hi + HOUR_NS))).size == 2)
    // disjoint range
    assert(catalog.files("mydb", "meas", Some((T0 + 100 * 24 * HOUR_NS, Long.MaxValue))).isEmpty)
  }

  test("engine: canonical time-range query (bare literal, O9 rewrite)") {
    val df = engine.query(
      "SELECT time, location, temperature FROM mydb.meas " +
        "WHERE time >= '2023-01-02T00:00:00Z' AND time < '2023-01-03T00:00:00Z' " +
        "ORDER BY time", "")
    val rows = df.collect()
    assert(rows.length == 24)
    assert(rows.forall(_.getString(1) == "loc2"))
    assert(rows.head.getLong(0) == T0 + 24 * HOUR_NS)
  }

  test("engine: epoch_ns literal form") {
    val df = engine.query(
      "SELECT count(*) AS cnt FROM meas WHERE time >= epoch_ns('2023-01-03T00:00:00'::TIMESTAMP)",
      "mydb")
    assert(df.collect().head.getLong(0) == 24L)
  }

  test("engine: aggregation over full table") {
    val df = engine.query(
      "SELECT location, count(*) AS n FROM mydb.meas GROUP BY location ORDER BY location", "")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("loc1", 24L), ("loc2", 24L), ("loc3", 24L)))
  }

  test("engine: empty pruned set → empty DataFrame with schema (quirk §2.3-6 fix)") {
    val df = engine.query(
      "SELECT * FROM mydb.meas WHERE time >= '2030-01-01T00:00:00Z'", "")
    assert(df.schema.fieldNames.contains("temperature"))
    assert(df.count() == 0)
  }

  test("engine: SHOW DATABASES / SHOW TABLES") {
    assert(engine.query("SHOW DATABASES", "").collect().map(_.getString(0)).toSeq == Seq("mydb"))
    assert(engine.query("show tables", "mydb").collect().map(_.getString(0)).toSeq == Seq("meas"))
    // SQL-level db selection, both keywords
    assert(engine.query("SHOW TABLES FROM mydb", "").collect()
      .map(_.getString(0)).toSeq == Seq("meas"))
    assert(engine.query("show tables in mydb;", "otherdb").collect()
      .map(_.getString(0)).toSeq == Seq("meas"))
  }

  test("engine: table-free fallback (SELECT 1, version())") {
    val r = engine.query("SELECT 1 AS one, version() AS v", "").collect().head
    assert(r.getInt(0) == 1)
    assert(r.getString(1).startsWith("4."))
  }

  test("engine: join across two lake tables (all relations registered)") {
    import spark.implicits._
    val d = new File(root, "mydb/locdim"); d.mkdirs()
    Seq(("loc1", "west"), ("loc2", "east"), ("loc3", "north"))
      .toDF("location", "zone").coalesce(1)
      .write.mode("overwrite").parquet(d.getAbsolutePath)
    val df = engine.query(
      "SELECT l.zone, count(*) AS n FROM mydb.meas m " +
        "JOIN mydb.locdim l ON m.location = l.location " +
        "WHERE m.time >= '2023-01-02T00:00:00Z' " +
        "GROUP BY l.zone ORDER BY l.zone", "")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("east", 24L), ("north", 24L)))
  }

  test("alias-aware per-relation time extraction") {
    val plan = TimeRangeExtract.parse(spark,
      "SELECT * FROM mydb.meas m JOIN mydb.other o ON m.location = o.location " +
        "WHERE m.time >= '2023-01-02T00:00:00Z' AND o.time >= '2023-01-03T00:00:00Z'")
    val per = TimeRangeExtract.extractPerRelation(plan, "time")
    assert(per("meas").start.contains(T0 + 24 * HOUR_NS))
    assert(per("other").start.contains(T0 + 48 * HOUR_NS))
    // unqualified time with MULTIPLE relations attributes to neither
    val plan2 = TimeRangeExtract.parse(spark,
      "SELECT * FROM mydb.meas m JOIN mydb.other o ON m.location = o.location " +
        "WHERE time >= '2023-01-02T00:00:00Z'")
    val per2 = TimeRangeExtract.extractPerRelation(plan2, "time")
    assert(per2("meas").isEmpty && per2("other").isEmpty)
    // unqualified with a single relation still attributes
    val plan3 = TimeRangeExtract.parse(spark,
      "SELECT * FROM mydb.meas WHERE time >= '2023-01-02T00:00:00Z'")
    assert(TimeRangeExtract.extractPerRelation(plan3, "time")
      .apply("meas").start.contains(T0 + 24 * HOUR_NS))
  }

  test("engine: non-lake relation falls through to spark catalog") {
    import spark.implicits._
    Seq((1, "x")).toDF("a", "b").createOrReplaceTempView("sidecar_tbl")
    val r = engine.query("SELECT b FROM sidecar_tbl WHERE a = 1", "").collect()
    assert(r.head.getString(0) == "x")
  }

  test("engine: UNION ALL branches with disjoint time windows keep all rows") {
    // the same table occurs twice with disjoint windows — intersecting
    // them would prune the shared view to nothing and silently return 0
    val df = engine.query(
      "SELECT time FROM mydb.meas WHERE time < '2023-01-02T00:00:00Z' " +
        "UNION ALL " +
        "SELECT time FROM mydb.meas WHERE time >= '2023-01-03T00:00:00Z'", "")
    assert(df.count() == 48) // day 1 + day 3
  }

  test("engine: self-join with per-alias disjoint windows keeps rows") {
    val df = engine.query(
      "SELECT a.time, b.time AS tb FROM mydb.meas a JOIN mydb.meas b " +
        "ON a.location <> b.location " +
        "WHERE a.time < '2023-01-02T00:00:00Z' AND b.time >= '2023-01-03T00:00:00Z'", "")
    assert(df.count() == 24L * 24L) // day-1 rows × day-3 rows
    // AND each occurrence's scan is pruned by ITS OWN alias's window:
    // the a-side reads only day-1's file, the b-side only day-3's
    val scans = df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles.toSeq
    }
    assert(scans.size == 2)
    assert(scans.forall(_.size == 1), scans)
    assert(scans.flatten.exists(_.contains("date=2023-01-01")))
    assert(scans.flatten.exists(_.contains("date=2023-01-03")))
  }

  test("engine: multi-occurrence without usable aliases stays unpruned but correct") {
    // UNION ALL branches referencing the bare table: no statement-unique
    // alias to attribute to → both occurrences read all 3 days; WHERE
    // still filters (pruning is a strict optimization)
    val df = engine.query(
      "SELECT time FROM mydb.meas WHERE time < '2023-01-02T00:00:00Z' " +
        "UNION ALL SELECT time FROM mydb.meas WHERE time >= '2023-01-03T00:00:00Z'", "")
    assert(df.count() == 48L)
    val scans = df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles.toSeq
    }
    assert(scans.forall(_.size == 3), scans) // conservative: unpruned
  }

  test("engine: multi-occurrence table disables pruning (extract level)") {
    val plan = TimeRangeExtract.parse(spark,
      "SELECT * FROM mydb.meas WHERE time < '2023-01-02T00:00:00Z' " +
        "UNION ALL SELECT * FROM mydb.meas WHERE time >= '2023-01-03T00:00:00Z'")
    assert(TimeRangeExtract.extractPerRelation(plan, "time")("meas").isEmpty)
  }

  test("engine: db.table inside a string literal is not rewritten") {
    val df = engine.query(
      "SELECT 'mydb.meas' AS lit_val, count(*) AS n FROM mydb.meas", "")
    val r = df.collect().head
    assert(r.getString(0) == "mydb.meas")
    assert(r.getLong(1) == 72L)
  }

  test("engine: lake table referenced only inside a subquery is registered") {
    val df = engine.query(
      "SELECT count(*) AS n FROM mydb.meas m WHERE m.location IN " +
        "(SELECT l.location FROM mydb.locdim l WHERE l.zone = 'east')", "")
    assert(df.collect().head.getLong(0) == 24L)
  }

  test("engine: same-named tables in different dbs read BOTH tables") {
    import spark.implicits._
    // a second db holding its own `meas` with different content — the
    // view name must carry the db or both references silently read one
    val d = new File(root, "otherdb/meas"); d.mkdirs()
    Seq((T0, "locX", 999.0), (T0 + HOUR_NS, "locY", 998.0))
      .toDF("time", "location", "temperature").coalesce(1)
      .write.mode("overwrite").parquet(d.getAbsolutePath)
    val counts = engine.query(
      "SELECT (SELECT count(*) FROM mydb.meas) AS a, " +
        "(SELECT count(*) FROM otherdb.meas) AS b", "").collect().head
    assert(counts.getLong(0) == 72L && counts.getLong(1) == 2L)
    // cross-db join between the same-named tables
    val j = engine.query(
      "SELECT count(*) AS n FROM mydb.meas m JOIN otherdb.meas o " +
        "ON m.location <> o.location", "")
    assert(j.collect().head.getLong(0) == 72L * 2L)
    // bare name still resolves through the default db
    assert(engine.query("SELECT count(*) AS n FROM meas", "otherdb")
      .collect().head.getLong(0) == 2L)
  }

  test("engine: literal rewrite is alias-scoped in mixed time-type joins") {
    import spark.implicits._
    // a lake table whose `time` is a native TIMESTAMP, not int64 ns —
    // its literals must NOT be rewritten to epoch-ns longs
    val d = new File(root, "tsdb/tsev"); d.mkdirs()
    Seq(("loc2", java.time.Instant.parse("2023-01-01T10:00:00Z")),
        ("loc2", java.time.Instant.parse("2023-01-01T20:00:00Z")),
        ("loc3", java.time.Instant.parse("2023-01-01T10:00:00Z")))
      .toDF("location", "time").coalesce(1)
      .write.mode("overwrite").parquet(d.getAbsolutePath)
    val df = engine.query(
      "SELECT count(*) AS n FROM mydb.meas m JOIN tsdb.tsev e " +
        "ON m.location = e.location " +
        "WHERE m.time >= '2023-01-02T00:00:00Z' " +   // long side: ns rewrite
        "AND e.time < '2023-01-01T12:00:00Z'", "")    // ts side: native semantics
    // e rows before noon: (loc2,10h),(loc3,10h); m rows from day 2 on:
    // 24×loc2 (day 2) + 24×loc3 (day 3)
    assert(df.collect().head.getLong(0) == 48L)
  }

  test("engine: unfiltered count(*) is answered from metadata, zero files read") {
    import spark.implicits._
    val dir = Files.createTempDirectory(
      new File("target").toPath.toAbsolutePath, "metacount").toFile
    val d = new File(dir, "mydb/mc"); d.mkdirs()
    Seq((T0, 1.0), (T0 + HOUR_NS, 2.0)).toDF("time", "v").coalesce(1)
      .write.mode("overwrite").parquet(d.getAbsolutePath)
    val part = d.listFiles().find(_.getName.endsWith(".parquet")).get
    val tgt = new File(d, "part0.parquet"); part.renameTo(tgt)
    Files.writeString(new File(d, "metadata.json").toPath,
      s"""{"type":"parquet","row_count":2,"min_time":$T0,"max_time":${T0 + HOUR_NS},
         |"files":[{"path":"part0.parquet","row_count":2,"min_time":$T0,"max_time":${T0 + HOUR_NS}}]}"""
        .stripMargin)
    val eng = new Engine(spark, new Catalog(dir.getAbsolutePath))
    // auto-name must match what a real scan produces
    assert(spark.range(1).selectExpr("count(*)").columns.head == "count(1)")
    // DELETE the data file: only a metadata answer can succeed now
    assert(tgt.delete())
    val df = eng.query("SELECT count(*) FROM mydb.mc", "")
    assert(df.columns.toSeq == Seq("count(1)"))
    assert(df.collect().head.getLong(0) == 2L)
    assert(eng.query("SELECT count(*) AS n FROM mydb.mc", "")
      .collect().head.getLong(0) == 2L)
    // min/max(time) come from the zone maps in the same fast path,
    // mixed with count in one statement
    val stats = eng.query(
      "SELECT count(*) AS n, min(time) AS lo, max(time) AS hi FROM mydb.mc", "")
      .collect().head
    assert(stats.getLong(0) == 2L && stats.getLong(1) == T0 &&
      stats.getLong(2) == T0 + HOUR_NS)
    assert(eng.query("SELECT min(time) FROM mydb.mc", "")
      .columns.toSeq == Seq("min(time)"))
    // a time range that FULLY COVERS the file's zone map is still
    // provable from metadata (day-bucketed dashboard counts) — the
    // data file is gone, only metadata can answer
    assert(eng.query(
      s"SELECT count(*) AS n FROM mydb.mc WHERE time >= $T0 AND time <= ${T0 + HOUR_NS}", "")
      .collect().head.getLong(0) == 2L)
    // a range that SPLITS the file (partial overlap) is unprovable and
    // must scan — which fails here, proving no metadata guess was made
    assertThrows[Exception] {
      eng.query(s"SELECT count(*) FROM mydb.mc WHERE time > $T0", "").collect()
    }
    // a non-time predicate must scan too
    assertThrows[Exception] {
      eng.query(s"SELECT count(*) FROM mydb.mc WHERE time >= $T0 AND v > 0", "")
        .collect()
    }
    // a non-metadata aggregate alongside count must scan (and fail here)
    assertThrows[Exception] {
      eng.query("SELECT count(*), avg(v) FROM mydb.mc", "").collect()
    }
  }

  test("engine: count(*) falls back to a scan when any file lacks row_count") {
    import spark.implicits._
    val dir = Files.createTempDirectory(
      new File("target").toPath.toAbsolutePath, "metacount2").toFile
    val d = new File(dir, "mydb/mc2"); d.mkdirs()
    Seq((T0, 1.0), (T0 + HOUR_NS, 2.0), (T0 + 2 * HOUR_NS, 3.0))
      .toDF("time", "v").coalesce(1)
      .write.mode("overwrite").parquet(d.getAbsolutePath) // no metadata.json
    val eng = new Engine(spark, new Catalog(dir.getAbsolutePath))
    assert(new Catalog(dir.getAbsolutePath).metadataRowCount("mydb", "mc2").isEmpty)
    assert(eng.query("SELECT count(*) AS n FROM mydb.mc2", "")
      .collect().head.getLong(0) == 3L) // real scan, correct answer
  }

  test("engine: DESCRIBE over a lake table resolves through the splice") {
    val rows = engine.query("DESCRIBE SELECT * FROM mydb.meas", "")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("time", "bigint"), ("location", "string"),
      ("temperature", "double")))
  }

  test("engine: EXPLAIN over a lake table resolves through the splice") {
    val text = engine.query(
      "EXPLAIN SELECT count(*) FROM mydb.meas WHERE time >= '2023-01-03T00:00:00Z'", "")
      .collect().map(_.getString(0)).mkString
    assert(text.contains("Scan parquet") || text.contains("Relation"), text)
    assert(!text.toLowerCase.contains("unresolved"), text)
  }

  test("engine: CTE name shadows a same-named lake table") {
    val df = engine.query(
      "WITH meas AS (SELECT 42 AS v) SELECT v FROM meas", "mydb")
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(42))
  }

  test("engine: non-recursive CTE reading its own name sees the LAKE table") {
    // standard SQL: without RECURSIVE, a definition's own name is not
    // in scope inside itself — `WITH meas AS (SELECT ... FROM meas)`
    // reads the base (lake) table
    val df = engine.query(
      "WITH meas AS (SELECT time FROM meas WHERE time < '2023-01-02T00:00:00Z') " +
        "SELECT count(*) AS n FROM meas", "mydb")
    assert(df.collect().head.getLong(0) == 24L) // day-1 rows of the lake table
  }

  test("engine: CTE visibility is sequential — an earlier def sees the lake table, not a later CTE") {
    // `WITH a AS (... FROM meas), meas AS (...)`: inside a's definition
    // the LATER sibling CTE `meas` is not yet visible (SQL-standard
    // sequential scoping), so `meas` must splice to the lake table
    val df = engine.query(
      "WITH a AS (SELECT count(*) AS n FROM meas), " +
        "meas AS (SELECT 1 AS one) " +
        "SELECT a.n, (SELECT count(*) FROM meas) AS m FROM a", "mydb")
    val row = df.collect().head
    assert(row.getLong(0) == 72L) // lake table, all 3 days
    assert(row.getLong(1) == 1L)  // the child scope sees the CTE
  }

  test("engine: CTE shadowing is scoped — a subquery's CTE does not hide the lake table outside it") {
    // a CTE named `meas` lives INSIDE a scalar subquery; the outer bare
    // `meas` must still resolve to the lake table. A statement-global
    // shadow set would leave the outer reference unregistered and fail.
    val df = engine.query(
      "SELECT (SELECT max(v) FROM (WITH meas AS (SELECT 42 AS v) " +
        "SELECT v FROM meas)) AS cte_v, count(*) AS n FROM meas", "mydb")
    val row = df.collect().head
    assert(row.getInt(0) == 42)
    assert(row.getLong(1) == 72L) // full lake table row count
    // and the converse still holds: inside the WITH scope the CTE wins
    val df2 = engine.query(
      "WITH meas AS (SELECT 42 AS v) SELECT (SELECT count(*) FROM meas) AS n", "mydb")
    assert(df2.collect().head.getLong(0) == 1L)
  }

  test("engine: outer window does not prune a subquery over the same table") {
    // outer restricts to day 3; subquery aggregates over ALL days — if the
    // outer window pruned the shared view, min(time) would be day-3's start
    val df = engine.query(
      "SELECT count(*) AS n FROM mydb.meas " +
        "WHERE time >= '2023-01-03T00:00:00Z' " +
        "AND time > (SELECT min(time) FROM mydb.meas)", "")
    assert(df.collect().head.getLong(0) == 24L)
  }
}
