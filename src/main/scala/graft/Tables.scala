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
 *
 * The physical annotation of the lake's `ts` column is NOT under our
 * control (the test lake has shipped both TIMESTAMP(NANOS) and
 * timestamp[us] across regenerations), so [[load]] normalizes every
 * timestamp-typed `ts` to the same int64-ns contract via exact
 * integer µs→ns math — downstream operators always see LongType ns
 * regardless of which annotation the files carry (TsEncodingSpec is
 * the canary that pins this across encodings).
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
    // re-derive native timestamp comparisons from int64-ns predicates so
    // time-range filters keep skipping parquet row groups. Registered in
    // extraOptimizations ONLY when the session doesn't already carry the
    // rule — a GraftExtensions session injects it into the main optimizer
    // batch, and registering it twice would pay a redundant (if no-op)
    // tree traversal per query. The injected-rule probe walks the
    // optimizer's batch list once per session and is memoized (weakly,
    // so stopped sessions don't pin).
    if (!spark.experimental.extraOptimizations.exists(_ eq plans.NsTimeFilterPushdown))
      regLock.synchronized { // settle the concurrent-first-query race:
        // an unsynchronized check-then-append could register twice
        if (!spark.experimental.extraOptimizations.exists(_ eq plans.NsTimeFilterPushdown)
            && !extensionInjected(spark))
          spark.experimental.extraOptimizations =
            spark.experimental.extraOptimizations :+ plans.NsTimeFilterPushdown
      }
  }

  private val regLock = new Object

  private val extensionChecked = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())
  private def extensionInjected(spark: SparkSession): Boolean =
    extensionChecked.computeIfAbsent(spark, s =>
      s.sessionState.optimizer.batches
        .exists(_.rules.exists(_ eq plans.NsTimeFilterPushdown)))

  // Memoize per (session, path, file fingerprint): a DataFrame is just a
  // plan, but building it costs a file listing + footer schema read —
  // per-query that dominates small-query latency when ~150 queries share
  // 10 tables. The fingerprint (mtime+length of the path) keys out
  // in-place regenerations, the LRU bound ages out dropped lakes, and a
  // per-load sweep drops every entry belonging to a stopped session — a
  // long-lived QueryServer must not pin stale plans or dead sessions.
  private val MaxCached = 128
  private[graft] def maxCachedForTest: Int = MaxCached
  private val cache =
    new java.util.LinkedHashMap[(SparkSession, String, Long), DataFrame](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String, Long), DataFrame]): Boolean =
        size() > MaxCached
    }

  /** mtime+length stat of the table path — one driver-side FS call
    * (one listing for a directory-backed table: a dir's own mtime does
    * NOT change when a same-named child is rewritten in place, so the
    * child (name, len, mtime) triples are mixed in), strictly cheaper
    * than the footer read it guards. 0 when the path is not yet
    * statable (the read itself will surface the error). */
  private def fingerprint(spark: SparkSession, path: String): Long =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(p)
      if (!st.isDirectory) st.getModificationTime * 31L + st.getLen
      else fs.listStatus(p).foldLeft(1125899906842597L) { (h, c) =>
        ((h * 31L + c.getPath.getName.hashCode) * 31L + c.getLen) * 31L +
          c.getModificationTime
      }
    } catch { case _: Exception => 0L }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    val path = s"$dir/$name.parquet"
    val key = (spark, path, fingerprint(spark, path))
    cache.synchronized {
      val it = cache.keySet().iterator()
      while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
      val hit = cache.get(key)
      if (hit != null) return hit
    }
    // plan construction (file listing + footer schema read — seconds on
    // a remote lake) happens OUTSIDE the lock so one slow first load
    // cannot stall every other session's cache hits; a concurrent
    // duplicate build is harmless (the plans are identical) and the
    // second put wins
    val df = normalizeTs(spark.read.parquet(path))
    cache.synchronized { cache.put(key, df) }
    df
  }

  /** Test hook: current cache keys (session identity, path, fingerprint). */
  private[graft] def cachedKeys: Seq[(SparkSession, String, Long)] =
    cache.synchronized {
      import scala.jdk.CollectionConverters._
      cache.keySet().asScala.toSeq
    }

  /**
   * Enforce the int64-ns `ts` contract regardless of the file's
   * physical timestamp annotation: NANOS-annotated files arrive as
   * LongType already (nanosAsLong, pass-through); µs-annotated files
   * arrive as TimestampType (isAdjustedToUTC) or TimestampNTZType
   * (wall-clock) and are converted with exact integer math —
   * `unix_micros(ts) * 1000`. The NTZ→LTZ cast is lossless because
   * the session time zone is pinned to UTC in [[configure]].
   *
   * Range note: int64 ns spans 1677–2262 — the reference engine's own
   * contract limit (its `time` column is int64 epoch-ns). A µs file
   * can physically carry timestamps beyond that; they would wrap in
   * the conversion, exactly as they would overflow the reference.
   * Lake data is in-range by contract; no guard is added.
   */
  private[graft] def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    import org.apache.spark.sql.functions.{col, unix_micros}
    df.schema.fields.find(_.name.equalsIgnoreCase(colName)) match {
      case Some(f) if f.dataType == TimestampType || f.dataType == TimestampNTZType =>
        df.withColumn(f.name, unix_micros(col(f.name).cast(TimestampType)) * 1000L)
      case _ => df
    }
  }

  /** Register every table as a temp view (for the SQL-form queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  // ---- schema-evolving reads (union_by_name parity) -------------------

  import org.apache.spark.sql.types._
  import org.apache.spark.sql.functions.{col, lit}

  /** DuckDB-style widening for union_by_name: integers widen to the
    * larger integer, any numeric mix involving fractions widens to
    * double (float only when both are float), anything vs string
    * degrades to string (the reference's marshaling rule, §1.3). */
  private val intRank: Map[DataType, Int] =
    Map(ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)
  private def numeric(t: DataType): Boolean =
    intRank.contains(t) || t == FloatType || t == DoubleType

  private[graft] def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (x, y) if intRank.contains(x) && intRank.contains(y) =>
      if (intRank(x) >= intRank(y)) x else y
    case (x, y) if numeric(x) && numeric(y) => DoubleType
    case (StringType, _) | (_, StringType) => StringType
    case (x, y) => throw new IllegalArgumentException(s"cannot widen $x vs $y")
  }

  /**
   * `read_parquet([...], union_by_name=true)` parity: Spark's
   * `mergeSchema` refuses the int32/int64 merges DuckDB widens through
   * (CANNOT_MERGE_INCOMPATIBLE_DATA_TYPE), so files are grouped by
   * footer schema, each group is read once, casts are applied to the
   * widened union schema, and groups union by name with nulls for
   * missing columns. One driver-side footer pass — the data itself is
   * still read exactly once, distributed.
   */
  def readEvolving(spark: SparkSession, paths: Seq[String],
                   timeCols: Seq[String] = Seq("ts", "time")): DataFrame = {
    configure(spark)
    // The int64-ns normalization must happen PER RAW-SCHEMA GROUP,
    // before widening: a table holding both a NANOS-annotated file
    // (LongType via nanosAsLong) and a µs-timestamp file would
    // otherwise hit widen(LongType, TimestampType) — unwidenable —
    // exactly when the annotation drift lands mid-table. Groups stay
    // keyed by the RAW footer schema (mixed-annotation files must not
    // share one parquet scan), while the widened union runs over the
    // POST-normalization types.
    def norm(df: DataFrame): DataFrame = timeCols.foldLeft(df)(normalizeTs)
    def normType(f: StructField): DataType =
      if (timeCols.exists(_.equalsIgnoreCase(f.name)) &&
        (f.dataType == TimestampType || f.dataType == TimestampNTZType)) LongType
      else f.dataType
    val bySchema = paths.map(p => (spark.read.parquet(p).schema, p))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
    if (bySchema.size == 1)
      return norm(spark.read.parquet(paths: _*))
    // widened union-by-name schema over all file groups
    val merged = scala.collection.mutable.LinkedHashMap[String, DataType]()
    bySchema.foreach { case (schema, _) =>
      schema.fields.foreach { f =>
        merged(f.name) = merged.get(f.name).map(widen(_, normType(f))).getOrElse(normType(f))
      }
    }
    bySchema.map { case (schema, ps) =>
      val have = schema.fieldNames.toSet
      norm(spark.read.parquet(ps: _*)).select(merged.toSeq.map { case (name, dt) =>
        if (have(name)) col(name).cast(dt).as(name)
        else lit(null).cast(dt).as(name)
      }: _*)
    }.reduce(_.unionByName(_))
  }
}
