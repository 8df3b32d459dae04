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

  /**
   * Two-sample log-rank test (Mantel 1966, Peto & Peto 1972) — "are
   * these two survival curves the same curve": [[kaplanMeier]] draws
   * each arm's curve; the log-rank z says whether the gap is real,
   * weighting every event time by its at-risk population — the
   * standard A/B read-out for retention and completion-time
   * experiments under censoring.
   *
   * Exact contract: per-(family, time) death/at-risk counts for the
   * total AND the treatment arm ride ONE frame (conditional sums +
   * two DESC cumulative windows on the same exchange) — all exact
   * longs; each event time's observed-minus-expected d₁ − d·n₁/n
   * and hypergeometric variance d·(n₁/n)(1−n₁/n)(n−d)/(n−1) are
   * fixed float dags over those longs, quantized to the 1e-9 grid
   * (signed, the qCW convention) so both cross-time sums are exact
   * in any partition order; z = ΣOE/√ΣV is one fixed dag,
   * gateRounded, and χ² = z² beside it. Zero total variance (no
   * event time mixes the arms) → defined = false.
   *
   * Scale shape: one (family, time) hash aggregate → ONE exchange on
   * the family key + one in-partition DESC sort (both at-risk
   * cumulatives share it) → one family aggregate. The subject table
   * never sorts.
   *
   * @return one row per family: (byCol, n, n_arm, n_events, o_minus_e,
   *         var_sum, z, chi2 — rounded 6, defined)
   */
  def logRank(df: DataFrame, byCol: String, armCol: String,
              durationCol: String, observedCol: String): DataFrame = {
    require(org.apache.spark.sql.graftbridge.ColumnBridge
        .isIntegral(df.schema(durationCol).dataType),
      s"logRank: $durationCol must be integral (got " +
        s"${df.schema(durationCol).dataType.simpleString}) — exact time " +
        "ties are the point")
    Seq(armCol, observedCol).foreach { c =>
      require(df.schema(c).dataType ==
          org.apache.spark.sql.types.BooleanType,
        s"logRank: $c must be boolean (got " +
          s"${df.schema(c).dataType.simpleString})")
    }
    val ct = df.filter(col(byCol).isNotNull && col(armCol).isNotNull &&
        col(durationCol).isNotNull && col(observedCol).isNotNull)
      .select(col(byCol).as("__g"),
        col(durationCol).cast("long").as("__t"),
        when(col(observedCol), 1L).otherwise(0L).as("__e"),
        when(col(armCol), 1L).otherwise(0L).as("__a"))
      .groupBy(col("__g"), col("__t"))
      .agg(sum(col("__e")).as("__d"),
        sum(col("__e") * col("__a")).as("__d1"),
        count(lit(1)).as("__tot"), sum(col("__a")).as("__tot1"))
    import org.apache.spark.sql.expressions.Window
    val desc = Window.partitionBy(col("__g")).orderBy(col("__t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withN = ct.select(col("__g"), col("__t"), col("__d"),
      col("__d1"), col("__tot"), col("__tot1"),
      sum(col("__tot")).over(desc).as("__n"),
      sum(col("__tot1")).over(desc).as("__n1"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val p1 = d(col("__n1")) / d(col("__n"))
    val oe = d(col("__d1")) - d(col("__d")) * p1
    val v = when(col("__n") > 1, d(col("__d")) * p1 * (lit(1.0) - p1) *
      (d(col("__n") - col("__d")) / d(col("__n") - 1L)))
      .otherwise(lit(0.0))
    val qoe = when(col("__d") > 0,
      floor(oe * lit(1e9) + lit(0.5)).cast("long")).otherwise(lit(0L))
    val qv = when(col("__d") > 0,
      floor(v * lit(1e9) + lit(0.5)).cast("long")).otherwise(lit(0L))
    val stats = withN
      .select(col("__g"), col("__tot"), col("__tot1"), col("__d"),
        qoe.as("__qoe"), qv.as("__qv"))
      .groupBy(col("__g"))
      .agg(sum(col("__tot")).as("n"), sum(col("__tot1")).as("n_arm"),
        sum(col("__d")).as("n_events"), sum(col("__qoe")).as("__soe"),
        sum(col("__qv")).as("__sv"))
    val soe = d(col("__soe")) / lit(1e9)
    val sv = d(col("__sv")) / lit(1e9)
    val defined = col("__sv") > 0L
    stats.select(col("__g").as(byCol), col("n"), col("n_arm"),
      col("n_events"),
      graft.functions.GateRound(soe, 6).as("o_minus_e"),
      round(sv, 6).as("var_sum"),
      when(defined, graft.functions.GateRound(soe / sqrt(sv), 6))
        .otherwise(lit(0.0)).as("z"),
      when(defined, graft.functions.GateRound(soe / sqrt(sv) *
        (soe / sqrt(sv)), 6)).otherwise(lit(0.0)).as("chi2"),
      defined.as("defined"))
  }

  /**
   * One-sided upper CUSUM change detector (Page 1954) — the
   * sequential "did this metric drift up" monitor for a per-group
   * ordered series (error rates per batch, latency per window, queue
   * depth per tick): the Page recursion Sᵢ = max(0, Sᵢ₋₁ + xᵢ − k)
   * accumulates evidence of a level shift past the reference k and
   * alarms when S crosses h — far faster to detect small sustained
   * shifts than any fixed-window mean compare.
   *
   * Exact contract: 100% INTEGER. The recursion is NOT a window
   * primitive, but its closed form is — Sᵢ = Cᵢ − min_{j≤i} Cⱼ with
   * Cᵢ the plain cumulative of yᵢ = xᵢ − k (including the C₀ = 0
   * virtual start: the running min is clamped at 0) — so one
   * cumulative-sum window and one running-min window over the SAME
   * (group, seq) sort give the exact S series; the alarm compare
   * S > h, the alarm census and the argmin-style first-alarm are
   * all integer. Duplicate seq values are REFUSED (raise_error —
   * CUSUM over an ambiguous order is a different series per run).
   *
   * Scale shape: one exchange on the group key + ONE in-partition
   * sort (cumsum, running-min, and the duplicate-seq check share
   * it), one partial/final aggregate to |groups| rows.
   *
   * @return (byCol, n, max_s — the peak statistic, n_alarms,
   *         first_alarm_seq — null when never — threshold h echoed,
   *         alarmed)
   */
  def cusum(df: DataFrame, byCol: String, seqCol: String, xCol: String,
            target: Long, threshold: Long): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    Seq(seqCol, xCol).foreach { c =>
      require(org.apache.spark.sql.graftbridge.ColumnBridge
          .isIntegral(df.schema(c).dataType),
        s"cusum: $c must be integral (got " +
          s"${df.schema(c).dataType.simpleString}) — the all-integer " +
          "detection contract")
    }
    val clean = df.filter(col(byCol).isNotNull && col(seqCol).isNotNull &&
        col(xCol).isNotNull)
      .select(col(byCol).as("__g"), col(seqCol).cast("long").as("__i"),
        (col(xCol).cast("long") - lit(target)).as("__y"))
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(col("__g")).orderBy(col("__i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val guarded = clean
      .select(col("__g"), col("__i"), col("__y"),
        count(lit(1)).over(Window.partitionBy(col("__g"), col("__i")))
          .as("__dup"))
      .select(col("__g"), col("__i"),
        when(col("__dup") === 1L, col("__y")).otherwise(raise_error(
          concat(lit("cusum: duplicate sequence value "),
            col("__i").cast("string"), lit(" in group "),
            col("__g").cast("string"),
            lit(" — the detection order is ambiguous; dedupe " +
              "upstream")))).as("__y"))
    // S_i = C_i - min(0, min_{j<=i} C_j): the virtual C_0 = 0 start
    // clamps the running min at zero
    val withCum = guarded.select(col("__g"), col("__i"),
      sum(col("__y")).over(ord).as("__c"))
    val s = col("__c") - least(lit(0L), min(col("__c")).over(ord))
    val rows = withCum
      .select(col("__g"), col("__i"), s.as("__s"))
      .select(col("__g"), col("__i"), col("__s"),
        (col("__s") > threshold).as("__al"))
    rows.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), max(col("__s")).as("max_s"),
        sum(when(col("__al"), 1L).otherwise(0L)).as("n_alarms"),
        min(when(col("__al"), col("__i"))).as("first_alarm_seq"))
      .select(col("__g").as(byCol), col("n"), col("max_s"),
        col("n_alarms"), col("first_alarm_seq"),
        lit(threshold).as("h"),
        (col("n_alarms") > 0L).as("alarmed"))
  }
}
