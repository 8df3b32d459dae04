package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Structured Streaming over the events lake.
 *
 * The reference is strictly batch-at-rest — its "streams" are
 * append-only hour-partitioned parquet (SURVEY.md §2.2 "Streaming:
 * absent"). This module is the Spark-native upgrade: the same parquet
 * directories consumed incrementally with `readStream`, windowed
 * aggregation with watermarked late-data handling, and gap-based
 * sessionization via `session_window` — so a lake table doubles as a
 * stream source with identical semantics to the batch queries
 * (q41/q45 are the batch twins of these).
 */
object EventStream {

  /** Incremental scan of an events directory (schema must be supplied —
    * streaming reads don't infer). ns-long `ts` is converted to a µs
    * TimestampType event-time column for watermarking.
    *
    * The supplied schema is the LOGICAL contract (ts: int64 ns, per
    * Tables.normalizeTs); the files on disk may physically carry a
    * µs timestamp annotation instead. A one-time batch footer read
    * resolves the physical schema (stream-source setup cost, not
    * per-batch), and the same normalization as the batch path brings
    * `ts` back to the contract — so batch and streaming twins agree
    * byte-for-byte whatever the lake's current encoding. */
  def readEvents(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    graft.Tables.configure(spark)
    // `schema` is the LOGICAL contract (full events schema, ts int64
    // ns), used only when the directory has no files yet to probe —
    // it is NOT a projection hook (prune downstream instead). If µs
    // files later land in a dir that probed empty, the stream reads
    // them through the logical schema and fails loudly per batch; the
    // warn below makes the why findable at setup time, and the
    // diagnostics listener re-explains it AT FAILURE TIME (the batch
    // failure is a generic parquet conversion error that doesn't name
    // this fallback as the cause).
    val physical = scala.util.Try(spark.read.parquet(dir).schema).getOrElse {
      log.warn(
        s"readEvents: no readable files under $dir at stream start; " +
          "falling back to the supplied logical schema — if files with a " +
          "timestamp-annotated ts arrive later, restart the stream so the " +
          "physical schema can be probed")
      installFallbackDiagnostics(spark, dir)
      schema
    }
    graft.Tables.normalizeTs(spark.readStream.schema(physical).parquet(dir))
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
  }

  private def log = org.slf4j.LoggerFactory.getLogger(EventStream.getClass)

  /** Dirs that fell back to the logical schema, per session — consulted
    * when a streaming query later dies on a parquet conversion error. */
  private val fallbackDirs = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.Set[String]]())

  /** The remediation message for a terminal streaming error caused by
    * reading annotation-drifted files through the empty-probe logical
    * schema; None when the error is something else. Factored out so the
    * detection is unit-testable without driving a failing stream. */
  private[graft] def fallbackDiagnosis(err: String,
                                           dirs: Iterable[String]): Option[String] =
    if (dirs.nonEmpty &&
        (err.contains("Parquet column cannot be converted") ||
          err.contains("SchemaColumnConvertNotSupportedException") ||
          err.contains("PARQUET_CONVERSION_FAILURE")))
      Some("streaming batch failed converting a parquet column; source dirs " +
        dirs.mkString("[", ", ", "]") + " probed EMPTY at stream start and " +
        "fell back to the supplied logical schema (ts: int64 ns) — if " +
        "timestamp-annotated files have since arrived there, restart the " +
        "stream so readEvents can probe the physical schema and normalize it")
    else None

  /** One listener per session: when any streaming query terminates with
    * a parquet conversion error and at least one readEvents source fell
    * back to its logical schema, log the likely cause + fix. */
  private def installFallbackDiagnostics(spark: SparkSession, dir: String): Unit = {
    // first-install decision under the map's own lock: two streams
    // probing empty concurrently must not both register a listener
    // (every diagnosis would then log twice)
    val (dirs, first) = fallbackDirs.synchronized {
      val d = fallbackDirs.computeIfAbsent(spark,
        _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
      val f = d.isEmpty
      d.add(dir)
      (d, f)
    }
    if (first) spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
          e.exception.foreach { msg =>
            import scala.jdk.CollectionConverters._
            fallbackDiagnosis(msg, dirs.asScala.toSeq).foreach(log.error)
          }
      })
  }

  /** Tumbling-window per-type counts with late-data watermark —
    * streaming twin of the batch hour-bucket aggregation (q41). */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming twin of the batch COLD tier
    * ([[graft.operators.Retention.tieredDownsample]]'s rollup branch):
    * watermarked tumbling-window rollups of (n_rows, v_avg, v_min,
    * v_max) per (window, keys). The average is the same EXACT
    * DECIMAL(27,9) sum cast to double as the batch tier
    * (order-independent — the qB5 cross-engine convention), so a
    * window's FINAL value equals the batch rollup of the same rows
    * exactly; StreamingSpec pins streaming ≡ batch. Deployment shape:
    * the hot tier is the raw stream itself (append passthrough /
    * [[LakeIngest]]); this query maintains the rollup table the batch
    * reader unions past the cutoff — state is one aggregate row per
    * open (window, keys), evicted at the watermark. */
  def tieredRollup(events: DataFrame, window_ : String = "1 hour",
                   watermark: String = "2 hours",
                   keyCols: Seq[String] = Seq("event_type"),
                   valCol: String = "value"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valCol).cast("decimal(27,9)")).as("__vsum"),
        min(col(valCol)).cast("double").as("v_min"),
        max(col(valCol)).cast("double").as("v_max"))
      .select(col("window.start").as("bucket_start") +: keyCols.map(col) ++:
        Seq(col("n_rows"),
          round(col("__vsum").cast("double") / col("n_rows"), 6).as("v_avg"),
          col("v_min"), col("v_max")): _*)

  /** Gap-based sessions (streaming twin of q45's 30-min session split). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /**
   * Stream-stream proximity join — the streaming twin of the batch
   * band join (q99 / [[graft.operators.BandJoin]]): rows from two
   * streams pair when their event times are within `tolerance` of
   * each other. Both sides are watermarked and the join condition is
   * a time-range predicate, so Spark bounds each side's join state to
   * watermark + tolerance — state does NOT grow with the streams
   * (the planner derives the state eviction from the range bound;
   * an unbounded-condition stream-stream join would be rejected).
   * Each side needs an `event_time` column (from [[readEvents]]).
   * Column names of the two sides must be disjoint apart from
   * `event_time`, which is re-aliased internally.
   */
  def proximityJoin(left: DataFrame, right: DataFrame,
                    tolMs: Long = 500,
                    watermark: String = "10 minutes"): DataFrame = {
    // Spark rejects stream-stream joins without an equality predicate —
    // the band-bucket decomposition (same trick as the batch
    // BandJoin) provides one: left rows explode to their ⌊t/tol⌋
    // bucket and both neighbours, the right side carries its single
    // bucket, and the exact range predicate re-checks on the bucket
    // matches. The time-range condition additionally lets the planner
    // bound each side's join state to watermark + tolerance.
    val tolUs = tolMs * 1000L
    val l = left.withColumnRenamed("event_time", "l_time")
      .withWatermark("l_time", watermark)
      .withColumn("__off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__band",
        col("__off") + floor(unix_micros(col("l_time")) / tolUs).cast("long"))
      .drop("__off")
    val r = right.withColumnRenamed("event_time", "r_time")
      .withWatermark("r_time", watermark)
      .withColumn("__band",
        floor(unix_micros(col("r_time")) / tolUs).cast("long"))
    l.join(r, l("__band") === r("__band") &&
        col("r_time") >= col("l_time") - expr(s"INTERVAL $tolMs MILLISECONDS") &&
        col("r_time") <= col("l_time") + expr(s"INTERVAL $tolMs MILLISECONDS"))
      .drop("__band")
  }

  /**
   * Stateful streaming exact-dedup: emit each fingerprint's FIRST
   * occurrence across micro-batches, suppress the rest. State is one
   * boolean per fingerprint key (flatMapGroupsWithState) — the
   * streaming face of the dedup north-star: an ingestion pipeline
   * that never lets a duplicate document downstream.
   */
  def dedupByFingerprint(keyed: org.apache.spark.sql.Dataset[(String, Long)])
      : org.apache.spark.sql.Dataset[(String, Long)] = {
    import keyed.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty // fingerprint already emitted
          else {
            state.update(true)
            rows.take(1) // first occurrence only
          }
      }
  }
}
