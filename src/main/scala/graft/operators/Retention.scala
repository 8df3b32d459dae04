package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Tiered-retention downsampling — the storage policy every large
 * time-series lake runs (keep raw fidelity for the recent window,
 * compact older data to coarse rollups): rows with `ts >= cutoffNs`
 * pass through RAW; older rows compact to one row per (keys, bucket)
 * carrying the count / avg / min / max that dashboards still need.
 *
 * Scale shape: the reference's lake layout is `date=/hour=`-partitioned
 * parquet (SURVEY §1.1), so the cutoff predicate is a PARTITION-PRUNING
 * split — each branch's scan reads only its own date folders, the hot
 * branch is map-only pass-through (never shuffled), and the cold branch
 * is one partial/final hash aggregate whose output is smaller than its
 * input by the bucket compaction factor. On a flat unpartitioned file
 * the two branches read the file twice; on the partitioned lake the
 * union reads every row exactly once, which is the deployment target.
 *
 * `v_avg` is rounded to 1e-6 on BOTH tiers (the q41/lmScore
 * cross-engine convention); min/max are exact row values and need no
 * rounding. The rollup average is computed as an EXACT DECIMAL sum
 * cast to double, then divided — a plain double `avg` is
 * summation-order-dependent, and at sf0.1 one bucket's float sum
 * landed a half-ulp either side of a round(x, 6) midpoint in Spark vs
 * DuckDB; the decimal sum is order-independent, so both engines round
 * the identical double.
 */
object Retention {

  def tieredDownsample(events: DataFrame, tsCol: String,
                       keyCols: Seq[String], valCol: String,
                       cutoffNs: Long, bucketNs: Long): DataFrame = {
    require(bucketNs > 0, "bucketNs must be positive")
    // pmod floors (−3 % 10 → 7) where SQL % truncates toward zero
    // (→ −3), so the two bucket formulas diverge on NEGATIVE
    // timestamps — epoch-ns lakes are non-negative by construction
    // (the reference's time model starts at unix epoch), and a
    // pre-1970 ts here means corrupted ingest, better refused loudly
    // than silently bucketed differently per engine.
    require(cutoffNs >= 0, "cutoffNs must be >= 0 (epoch-ns time model)")
    val keys = keyCols.map(col)
    val ts = col(tsCol)
    val raw = events.filter(ts >= cutoffNs)
      .select(keys ++ Seq(
        ts.as("bucket_ns"), lit(1L).as("n_rows"),
        round(col(valCol).cast("double"), 6).as("v_avg"),
        col(valCol).cast("double").as("v_min"),
        col(valCol).cast("double").as("v_max"),
        lit("raw").as("tier")): _*)
    // per-row tripwire for the same invariant on the data itself: a
    // negative ts fails the job with a named error instead of landing
    // in a floor-vs-truncate bucket the oracle disagrees on. One
    // codegen'd branch inside the scan — no extra pass.
    val guardedTs = when(ts < 0, raise_error(concat(
        lit(s"tieredDownsample: negative $tsCol (pre-epoch) in rollup "),
        lit("tier — floor (pmod) and SQL % bucketing diverge there"))))
      .otherwise(ts)
    val rolled = events.filter(ts < cutoffNs)
      .groupBy(keys :+ (guardedTs - pmod(guardedTs, lit(bucketNs)))
        .as("bucket_ns"): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valCol).cast("decimal(27,9)")).as("__vsum"),
        min(col(valCol)).cast("double").as("v_min"),
        max(col(valCol)).cast("double").as("v_max"))
      .select(keys ++ Seq(col("bucket_ns"), col("n_rows"),
        round(col("__vsum").cast("double") / col("n_rows"), 6).as("v_avg"),
        col("v_min"), col("v_max"), lit("rollup").as("tier")): _*)
    raw.unionByName(rolled)
  }

  /**
   * Kaplan–Meier product-limit survival estimator (Kaplan & Meier
   * 1958) — the censoring-correct lifetime curve (user retention,
   * job/crawl completion times, label-queue latency): a plain "mean
   * duration" over data where some subjects are still alive
   * (censored) is biased low; KM multiplies per-event-time hazard
   * complements S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ), counting censored
   * subjects in the at-risk denominators until they drop out.
   *
   * Exact contract: per-time death/censor counts and the at-risk
   * counts (a DESC cumulative over exact longs) are exact in any
   * partition order; each hazard-complement log ln((n−d)/n) is ONE
   * libm ln on ONE division of exact longs, quantized to the 1e-9
   * grid (signed — the qCW convention), so the cumulative log-
   * survival is an exact-long ASC cumulative over a deterministic
   * (time) order; S = exp of the de-quantized total rides the
   * established ln/exp libm-parity precedent under the final
   * round-6. Extinction (a time where every at-risk subject dies,
   * ln 0) is handled by an INTEGER flag cumulative — survival is
   * exactly 0.0 from that time on, no infinity enters the dag.
   *
   * Scale shape: one (group, time) hash aggregate → ONE exchange on
   * the group key with two in-partition sorts (the DESC at-risk
   * cumulative and the ASC log cumulative share the exchange); rows
   * emitted only at event times. The subject table never sorts —
   * only the per-time summary does.
   *
   * The Nelson–Aalen cumulative hazard H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ
   * (Nelson 1972, Aalen 1978) rides the SAME ascending window on the
   * same 1e-9 grid — the additive companion curve (exp(−H) is the
   * Fleming–Harrington survival variant), finite even at extinction
   * (d/n = 1 needs no log).
   *
   * @return one row per (group, event time): (byCol, t, n_risk,
   *         n_events, n_censored, survival, cum_hazard — rounded 6)
   */
  def kaplanMeier(df: DataFrame, byCol: String, durationCol: String,
                  observedCol: String): DataFrame = {
    require(org.apache.spark.sql.graftbridge.ColumnBridge
        .isIntegral(df.schema(durationCol).dataType),
      s"kaplanMeier: $durationCol must be integral (got " +
        s"${df.schema(durationCol).dataType.simpleString}) — quantize " +
        "durations upstream; exact time ties are the point")
    require(df.schema(observedCol).dataType ==
        org.apache.spark.sql.types.BooleanType,
      s"kaplanMeier: $observedCol must be boolean (got " +
        s"${df.schema(observedCol).dataType.simpleString}) — censoring " +
        "must be explicit")
    val ct = df.filter(col(byCol).isNotNull && col(durationCol).isNotNull &&
        col(observedCol).isNotNull)
      .select(col(byCol).as("__g"),
        col(durationCol).cast("long").as("__t"),
        when(col(observedCol), 1L).otherwise(0L).as("__e"))
      .groupBy(col("__g"), col("__t"))
      .agg(sum(col("__e")).as("__d"),
        sum(lit(1L) - col("__e")).as("__c"))
    import org.apache.spark.sql.expressions.Window
    val g = Window.partitionBy(col("__g"))
    val atRisk = sum(col("__d") + col("__c")).over(
      g.orderBy(col("__t").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val withN = ct.select(col("__g"), col("__t"), col("__d"),
      col("__c"), atRisk.as("__n"))
    val lq = when(col("__d") > 0 && col("__n") > col("__d"),
      floor(log((col("__n") - col("__d")).cast("double") /
        col("__n").cast("double")) * lit(1e9) + lit(0.5)).cast("long"))
      .otherwise(lit(0L))
    val z = when(col("__d") > 0 && col("__n") === col("__d"), 1L)
      .otherwise(0L)
    // Nelson-Aalen cumulative-hazard increment d/n on the same grid:
    // H(t) rides the identical window as log-survival and stays
    // finite even at extinction (d/n = 1, no log involved)
    val hq = when(col("__d") > 0,
      floor(col("__d").cast("double") / col("__n").cast("double") *
        lit(1e9) + lit(0.5)).cast("long")).otherwise(lit(0L))
    val asc = g.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withN.select(col("__g"), col("__t"), col("__d"), col("__c"),
        col("__n"), lq.as("__lq"), z.as("__z"), hq.as("__hq"))
      .select(col("__g"), col("__t"), col("__d"), col("__c"),
        col("__n"), sum(col("__lq")).over(asc).as("__cl"),
        sum(col("__z")).over(asc).as("__cz"),
        sum(col("__hq")).over(asc).as("__ch"))
      .filter(col("__d") > 0)
      .select(col("__g").as(byCol), col("__t").as("t"),
        col("__n").as("n_risk"), col("__d").as("n_events"),
        col("__c").as("n_censored"),
        when(col("__cz") > 0, lit(0.0))
          .otherwise(round(exp(col("__cl").cast("double") / lit(1e9)),
            6)).as("survival"),
        round(col("__ch").cast("double") / lit(1e9), 6)
          .as("cum_hazard"))
  }
}
