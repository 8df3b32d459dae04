package graft.queries

import graft.Tables
import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Time-series operator set over the `events` measurement table.
 *
 * `ts` is the reference's `time` contract: int64 epoch-nanoseconds
 * (/root/reference/querier/queryClient.go:32,314 — literals compare
 * against an int64 column via `epoch_ns(...)`). We read the parquet
 * NANOS column as LongType (Tables.configure), so all bucket/delta
 * arithmetic is exact 64-bit integer math. Oracle-checked queries
 * additionally truncate to µs resolution (see `eventsUs`) because the
 * DuckDB oracle reads NANOS parquet as µs TIMESTAMP; the engine
 * itself carries full ns (ArrowEncoderSpec pins sub-µs fidelity).
 */
object TimeSeries {
  type Q = (SparkSession, String) => DataFrame

  private def T(s: SparkSession, dir: String)(n: String): DataFrame =
    Tables.load(s, dir, n)

  /**
   * `events` with `ts` truncated from ns to µs resolution (still int64 ns
   * units). The engine itself keeps full ns fidelity (see EventsNsSpec);
   * the truncation here exists because the DuckDB oracle reads parquet
   * NANOS columns as µs TIMESTAMP, so every oracle-visible derived value
   * (lag deltas, session bounds, as-of matches) must be computed at µs
   * resolution on both sides to hash-match. Bucketing at hour/day
   * granularity is unaffected (1000 divides both).
   */
  private def eventsUs(s: SparkSession, dir: String): DataFrame =
    T(s, dir)("events").withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))

  private val HOUR_NS = 3600L * 1000L * 1000L * 1000L
  private val DAY_NS = 24L * HOUR_NS
  private val MIN30_NS = 30L * 60L * 1000L * 1000L * 1000L

  /** ns since epoch for an ISO instant — the reference's epoch_ns(). */
  private def ns(iso: String): Long =
    java.time.Instant.parse(iso).toEpochMilli * 1000000L

  val queries: Map[String, Q] = Map(
    // time-range predicate on the int64-ns time column (reference O2 path)
    "q40_ts_range" -> ((s, dir) => {
      // filter on the RAW ns column (bounds are µs-aligned, so pre- vs
      // post-truncation filtering is equivalent) — this keeps the range
      // predicate pushed into the parquet scan; truncate only for output
      T(s, dir)("events")
        .filter(col("ts") >= ns("2024-01-10T00:00:00Z") &&
          col("ts") < ns("2024-01-12T00:00:00Z"))
        .withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
    }),

    // tumbling hour buckets via exact integer arithmetic
    "q41_ts_bucket" -> ((s, dir) => {
      val t = T(s, dir) _
      t("events")
        .groupBy((col("ts") - pmod(col("ts"), lit(HOUR_NS))).as("bucket_ns"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value"))
        .orderBy(col("bucket_ns"))
    }),

    // per-user inter-event gap (exact ns delta) + large-gap flag
    "q42_ts_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      eventsUs(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("delta_ns", col("ts") - col("prev_ts"))
        .withColumn("big_gap", (col("delta_ns") > MIN30_NS).cast("int"))
        .select(col("user_id"), col("event_id"), col("ts"), col("delta_ns"), col("big_gap"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),

    // daily per-type stats
    "q43_ts_daily" -> ((s, dir) => {
      val t = T(s, dir) _
      t("events")
        .groupBy((col("ts") - pmod(col("ts"), lit(DAY_NS))).as("day_ns"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"),
          min(col("value")).as("min_value"), max(col("value")).as("max_value"))
        .orderBy(col("day_ns"), col("event_type"))
    }),

    // as-of join: for each 'view', the latest 'click' of the same user at
    // or before it (oracle: DuckDB's native ASOF LEFT JOIN)
    "q44_ts_asof" -> ((s, dir) => {
      val ev = eventsUs(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      AsOfJoin.backward(views, clicks, Seq("user_id"), "ts", "ts",
          rightPayload = Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_event_id"), col("asof_ts"))
        .orderBy(col("event_id"))
    }),

    // gap-based sessionization (30-min inactivity), pure SQL-expressible
    "q45_ts_session" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      eventsUs(s, dir)
        .withColumn("new_session",
          when(col("ts") - lag(col("ts"), 1).over(w) > MIN30_NS, 1)
            .when(lag(col("ts"), 1).over(w).isNull, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(ws))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // arg-min/arg-max: first/last event payload per user
    "q46_ts_argminmax" -> ((s, dir) => {
      eventsUs(s, dir)
        .groupBy(col("user_id"))
        .agg(
          min(col("ts")).as("first_ts"),
          min_by(col("event_type"), col("ts")).as("first_type"),
          max(col("ts")).as("last_ts"),
          max_by(col("event_type"), col("ts")).as("last_type"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    }),

    // same as-of semantics through the NATIVE custom operator
    // (LogicalPlan + Strategy + SparkPlan — plans/AsOfJoinNative);
    // same DuckDB ASOF JOIN oracle as q44
    "q48_ts_asof_native" -> ((s, dir) => {
      val ev = eventsUs(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.plans.AsOfJoinNative.backward(views, clicks, Seq("user_id"),
          "ts", "ts", rightPayload = Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_event_id"), col("asof_ts"))
        .orderBy(col("event_id"))
    }),

    // LOCF (last observation carried forward): 'error' events have no
    // usable reading — fill from the user's previous non-error value
    "q49_ts_locf" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      eventsUs(s, dir)
        .withColumn("reading",
          when(col("event_type") =!= "error", col("value")))
        .withColumn("filled", last(col("reading"), ignoreNulls = true).over(w))
        .select(col("user_id"), col("event_id"), col("ts"),
          col("reading"), col("filled"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),

    // time-weighted average value per user (weights = seconds until
    // the next event; the classic irregular-series aggregate)
    "q4A_ts_time_weighted" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      eventsUs(s, dir)
        .withColumn("dt_s",
          (lead(col("ts"), 1).over(w) - col("ts")).cast("double") / 1e9)
        .filter(col("dt_s").isNotNull)
        .groupBy(col("user_id"))
        .agg(round(sum(col("value") * col("dt_s")) / sum(col("dt_s")), 4)
          .as("time_weighted_avg"), count(lit(1)).as("n_intervals"))
        .orderBy(col("user_id"))
    }),

    // SCD-style latest record per key (the "current state" view of an
    // append-only measurement stream)
    "q4B_ts_latest_per_key" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      eventsUs(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), col("value"))
        .orderBy(col("user_id"))
    }),

    // centered moving average (rows 2 preceding .. 2 following)
    "q4C_ts_centered_ma" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, 2)
      eventsUs(s, dir)
        .withColumn("centered_ma", round(avg(col("value")).over(w), 6))
        .select(col("user_id"), col("event_id"), col("ts"), col("value"),
          col("centered_ma"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),

    // PromQL-style counter increase/rate with RESET handling: a
    // counter that wraps (here: per-user running total mod 1000 —
    // deterministic resets) contributes its post-reset value, not a
    // negative delta. The cumsum is rounded to the 1e-6 grid before
    // the mod so Spark's sequential window sum and DuckDB's
    // segment-tree window sum agree bit-for-bit at the reset edges.
    "q98_ts_counter_rate" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      eventsUs(s, dir)
        .withColumn("counter",
          pmod(round(sum(abs(col("value"))).over(w), 6), lit(1000.0)))
        .withColumn("prev", lag(col("counter"), 1).over(w))
        .withColumn("inc", when(col("prev").isNull, lit(0.0))
          .when(col("counter") < col("prev"), col("counter")) // reset
          .otherwise(col("counter") - col("prev")))
        .groupBy(col("user_id"),
          (col("ts") - pmod(col("ts"), lit(DAY_NS))).as("day_ns"))
        .agg(graft.functions.GateRound(sum(col("inc")), 6).as("increase"),
          graft.functions.GateRound(sum(col("inc")) / lit(86400.0), 9)
            .as("rate_per_sec"))
        .orderBy(col("user_id"), col("day_ns"))
    }),

    // band join: click→purchase pairs within ±500 ms, via the bucketed
    // band-join operator (bucket equi-join + exact re-check) instead of
    // the BroadcastNestedLoopJoin a bare |a−b| ≤ tol theta join plans as
    "q99_ts_band_join" -> ((s, dir) => {
      val ev = eventsUs(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      graft.operators.BandJoin
        .bandJoin(clicks, purchases, "click_ts", "purchase_ts", 500000000L)
        .select(col("click_id"), col("purchase_id"),
          (col("purchase_ts") - col("click_ts")).as("dt_ns"))
        .orderBy(col("click_id"), col("purchase_id"))
    }),

    // linear-interpolation gap fill (the between-points sibling of
    // q49's LOCF): a sparse hourly series (users < 5) laid over the
    // dense bucket grid; missing interior buckets lerp between the
    // neighbouring known points, edges (no prev or no next) stay null.
    // Single-series here → one global window; per-key series would
    // partition the windows by the key.
    "q4D_ts_interp" -> ((s, dir) => {
      val t = T(s, dir) _
      val sparse = t("events").filter(col("user_id") < 5)
        .groupBy((col("ts") - pmod(col("ts"), lit(HOUR_NS))).as("bucket_ns"))
        .agg(round(avg(col("value")), 6).as("v"))
      val series = t("events")
        .agg(min(col("ts") - pmod(col("ts"), lit(HOUR_NS))).as("lo"),
          max(col("ts") - pmod(col("ts"), lit(HOUR_NS))).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), lit(HOUR_NS))).as("bucket_ns"))
      val wPrev = Window.orderBy("bucket_ns")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.orderBy("bucket_ns")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      series.join(sparse, Seq("bucket_ns"), "left")
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
        .withColumn("pt", last(when(col("v").isNotNull, col("bucket_ns")),
          ignoreNulls = true).over(wPrev))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
        .withColumn("nt", first(when(col("v").isNotNull, col("bucket_ns")),
          ignoreNulls = true).over(wNext))
        .withColumn("interp", round(
          when(col("v").isNotNull, col("v"))
            .when(col("pv").isNull || col("nv").isNull, lit(null))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              ((col("bucket_ns") - col("pt")) / (col("nt") - col("pt")))), 6))
        .select(col("bucket_ns"), col("v"), col("interp"))
        .orderBy(col("bucket_ns"))
    }),

    // gap fill: dense hourly series with zero-filled missing buckets
    "q47_ts_gapfill" -> ((s, dir) => {
      val t = T(s, dir) _
      val buckets = t("events")
        .groupBy((col("ts") - pmod(col("ts"), lit(HOUR_NS))).as("bucket_ns"))
        .agg(count(lit(1)).as("n"))
      val series = buckets
        .agg(min(col("bucket_ns")).as("lo"), max(col("bucket_ns")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), lit(HOUR_NS))).as("bucket_ns"))
      series.join(buckets, Seq("bucket_ns"), "left")
        .select(col("bucket_ns"), coalesce(col("n"), lit(0L)).as("n"))
        .orderBy(col("bucket_ns"))
    }),

    // tiered retention: last 7 days of the fixture's 30-day window stay
    // raw, the older 23 days compact to per-type hourly rollups — on
    // the date=/hour= lake the cutoff is a partition-pruning split (hot
    // branch map-only, cold branch one hash agg); µs-truncated ts on
    // the raw tier for oracle parity (eventsUs note above)
    "qB5_ts_retention" -> ((s, dir) => {
      graft.operators.Retention.tieredDownsample(
          eventsUs(s, dir), "ts", Seq("event_type"), "value",
          cutoffNs = ns("2024-01-24T00:00:00Z"), bucketNs = HOUR_NS)
        .orderBy(col("tier"), col("event_type"), col("bucket_ns"),
          col("v_avg"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q98_ts_counter_rate" -> """
      WITH c AS (
        SELECT user_id, event_id, epoch_ns(ts) AS tsns,
               round(SUM(abs(value)) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) % 1000
                 AS counter
        FROM events),
      d AS (
        SELECT user_id, tsns, counter,
               LAG(counter, 1) OVER (PARTITION BY user_id
                 ORDER BY tsns, event_id) AS prev
        FROM c)
      SELECT user_id, tsns - tsns % 86400000000000 AS day_ns,
             round(SUM(CASE WHEN prev IS NULL THEN 0
                            WHEN counter < prev THEN counter
                            ELSE counter - prev END), 6) + 0 AS increase,
             round(SUM(CASE WHEN prev IS NULL THEN 0
                            WHEN counter < prev THEN counter
                            ELSE counter - prev END) / 86400.0, 9) + 0
               AS rate_per_sec
      FROM d GROUP BY 1, 2 ORDER BY 1, 2""",
    "q99_ts_band_join" -> """
      SELECT a.event_id AS click_id, b.event_id AS purchase_id,
             epoch_ns(b.ts) - epoch_ns(a.ts) AS dt_ns
      FROM events a JOIN events b
        ON a.event_type = 'click' AND b.event_type = 'purchase'
       AND abs(epoch_ns(a.ts) - epoch_ns(b.ts)) <= 500000000
      ORDER BY 1, 2""",
    "q40_ts_range" -> """
      SELECT event_id, epoch_ns(ts) AS ts, event_type, value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
      ORDER BY event_id""",
    "q41_ts_bucket" -> """
      SELECT epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS bucket_ns,
             COUNT(*) AS n, ROUND(AVG(value), 6) AS avg_value
      FROM events GROUP BY 1 ORDER BY 1""",
    "q42_ts_lag" -> """
      SELECT user_id, event_id, epoch_ns(ts) AS ts,
             epoch_ns(ts) - LAG(epoch_ns(ts), 1) OVER w AS delta_ns,
             CAST(epoch_ns(ts) - LAG(epoch_ns(ts), 1) OVER w > 1800000000000 AS INT) AS big_gap
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, ts, event_id""",
    "q43_ts_daily" -> """
      SELECT epoch_ns(ts) - epoch_ns(ts) % 86400000000000 AS day_ns, event_type,
             COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value,
             MIN(value) AS min_value, MAX(value) AS max_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q44_ts_asof" -> """
      SELECT v.event_id, v.user_id, epoch_ns(v.ts) AS ts,
             c.event_id AS asof_event_id, epoch_ns(c.ts) AS asof_ts
      FROM (SELECT * FROM events WHERE event_type = 'view') v
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON v.user_id = c.user_id AND v.ts >= c.ts
      ORDER BY v.event_id""",
    "q48_ts_asof_native" -> """
      SELECT v.event_id, v.user_id, epoch_ns(v.ts) AS ts,
             c.event_id AS asof_event_id, epoch_ns(c.ts) AS asof_ts
      FROM (SELECT * FROM events WHERE event_type = 'view') v
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON v.user_id = c.user_id AND v.ts >= c.ts
      ORDER BY v.event_id""",
    "q45_ts_session" -> """
      WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts, 1) OVER w IS NULL THEN 1
                    WHEN epoch_ns(ts) - LAG(epoch_ns(ts), 1) OVER w > 1800000000000 THEN 1
                    ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), sessions AS (
        SELECT user_id, ts,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged
      )
      SELECT user_id, session_id, COUNT(*) AS n_events,
             epoch_ns(MIN(ts)) AS session_start, epoch_ns(MAX(ts)) AS session_end
      FROM sessions GROUP BY user_id, session_id
      ORDER BY user_id, session_id""",
    "q46_ts_argminmax" -> """
      SELECT user_id, epoch_ns(MIN(ts)) AS first_ts,
             MIN_BY(event_type, ts) AS first_type,
             epoch_ns(MAX(ts)) AS last_ts,
             MAX_BY(event_type, ts) AS last_type,
             COUNT(*) AS n
      FROM events GROUP BY user_id ORDER BY user_id""",
    "q49_ts_locf" -> """
      SELECT user_id, event_id, epoch_ns(ts) AS ts,
             CASE WHEN event_type != 'error' THEN value END AS reading,
             last_value(CASE WHEN event_type != 'error' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      FROM events
      ORDER BY user_id, ts, event_id""",
    "q4A_ts_time_weighted" -> """
      WITH d AS (
        SELECT user_id, value,
               CAST(LEAD(epoch_ns(ts), 1) OVER w - epoch_ns(ts) AS DOUBLE) / 1e9 AS dt_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      )
      SELECT user_id,
             ROUND(SUM(value * dt_s) / SUM(dt_s), 4) AS time_weighted_avg,
             COUNT(*) AS n_intervals
      FROM d WHERE dt_s IS NOT NULL
      GROUP BY user_id ORDER BY user_id""",
    "q4B_ts_latest_per_key" -> """
      SELECT user_id, event_id, epoch_ns(ts) AS ts, event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1 ORDER BY user_id""",
    "q4C_ts_centered_ma" -> """
      SELECT user_id, event_id, epoch_ns(ts) AS ts, value,
             ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 6) AS centered_ma
      FROM events ORDER BY user_id, ts, event_id""",
    "q4D_ts_interp" -> """
      WITH sp AS (
        SELECT epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS bucket_ns,
               round(avg(value), 6) AS v
        FROM events WHERE user_id < 5 GROUP BY 1),
      bounds AS (SELECT MIN(bucket_ns) AS lo, MAX(bucket_ns) AS hi FROM
        (SELECT epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS bucket_ns FROM events)),
      series AS (SELECT UNNEST(generate_series(lo, hi, 3600000000000)) AS bucket_ns FROM bounds),
      j AS (SELECT s.bucket_ns, sp.v FROM series s LEFT JOIN sp USING (bucket_ns)),
      f AS (SELECT bucket_ns, v,
              LAST_VALUE(v IGNORE NULLS) OVER (ORDER BY bucket_ns
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
              LAST_VALUE(CASE WHEN v IS NOT NULL THEN bucket_ns END IGNORE NULLS)
                OVER (ORDER BY bucket_ns
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
              FIRST_VALUE(v IGNORE NULLS) OVER (ORDER BY bucket_ns
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
              FIRST_VALUE(CASE WHEN v IS NOT NULL THEN bucket_ns END IGNORE NULLS)
                OVER (ORDER BY bucket_ns
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
            FROM j)
      SELECT bucket_ns, v,
             round(CASE WHEN v IS NOT NULL THEN v
                        WHEN pv IS NULL OR nv IS NULL THEN NULL
                        ELSE pv + (nv - pv) * ((bucket_ns - pt) / (nt - pt)) END, 6) AS interp
      FROM f ORDER BY bucket_ns""",
    "q47_ts_gapfill" -> """
      WITH b AS (
        SELECT epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS bucket_ns, COUNT(*) AS n
        FROM events GROUP BY 1
      ), bounds AS (SELECT MIN(bucket_ns) AS lo, MAX(bucket_ns) AS hi FROM b),
      series AS (SELECT UNNEST(generate_series(lo, hi, 3600000000000)) AS bucket_ns FROM bounds)
      SELECT s.bucket_ns, COALESCE(b.n, 0) AS n
      FROM series s LEFT JOIN b USING (bucket_ns)
      ORDER BY s.bucket_ns""",
    "qB5_ts_retention" -> """
      WITH e AS (SELECT event_type, value,
                        epoch_ns(ts) - epoch_ns(ts) % 1000 AS tsns
                 FROM events)
      SELECT event_type, tsns AS bucket_ns, 1::BIGINT AS n_rows,
             ROUND(value, 6) AS v_avg, value AS v_min, value AS v_max,
             'raw' AS tier
      FROM e WHERE tsns >= 1706054400000000000
      UNION ALL
      SELECT event_type, tsns - tsns % 3600000000000 AS bucket_ns,
             COUNT(*) AS n_rows,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(27,9))) AS DOUBLE)
                   / COUNT(*), 6) AS v_avg,
             MIN(value) AS v_min, MAX(value) AS v_max, 'rollup' AS tier
      FROM e WHERE tsns < 1706054400000000000
      GROUP BY 1, 2
      ORDER BY tier, event_type, bucket_ns, v_avg"""
  ).map { case (k, v) => k -> v.trim.replaceAll("\\s+", " ") }
}
