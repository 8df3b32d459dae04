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
        sum(col("__d")).as("n_events"),
        // decimal(38,0): per-time |qoe|, qv ≤ d·1e9 are signed-64,
        // but the cross-time sums are bounded only by n_events·1e9 —
        // a ~9e9-event group wraps a LONG sum (r19 grid-sum audit)
        sum(col("__qoe").cast("decimal(38,0)")).as("__soe"),
        sum(col("__qv").cast("decimal(38,0)")).as("__sv"))
    val soe = d(col("__soe")) / lit(1e9)
    val sv = d(col("__sv")) / lit(1e9)
    val defined = col("__sv") > lit(0L).cast("decimal(38,0)")
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
    // the duplicate census window partitions by (g, i) but rides the
    // SAME g-exchange as the ordered windows (hash(g) satisfies the
    // (g, i) clustering and the (g, i) sort is already required) —
    // placing it after them keeps the plan at ONE data exchange; the
    // refusal folds into the published S dag, so duplicates still
    // abort before any row is emitted (r18 plan-audit fix: the
    // pre-window guard cost a second hash(g, i) exchange)
    val withCum = clean.select(col("__g"), col("__i"),
      sum(col("__y")).over(ord).as("__c"),
      count(lit(1)).over(Window.partitionBy(col("__g"), col("__i")))
        .as("__dup"))
    val cGuard = when(col("__dup") === 1L, col("__c"))
      .otherwise(raise_error(
        concat(lit("cusum: duplicate sequence value "),
          col("__i").cast("string"), lit(" in group "),
          col("__g").cast("string"),
          lit(" — the detection order is ambiguous; dedupe upstream"))))
    // S_i = C_i - min(0, min_{j<=i} C_j): the virtual C_0 = 0 start
    // clamps the running min at zero
    val s = cGuard - least(lit(0L), min(col("__c")).over(ord))
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

  /**
   * Single mean-shift changepoint locator (the CUSUM-of-deviations /
   * binary-segmentation first split, Page 1955; Scott & Knott 1974)
   * — [[cusum]]'s companion question: the monitor says a per-group
   * ordered series DRIFTED; this says WHERE — the split k maximizing
   * the between-segment contrast. The statistic is the scaled
   * deviation g_k = |n·C_k − k·C_n| (C = prefix sums): maximizing it
   * is exactly maximizing |mean_before − mean_after| weighted by
   * k(n−k), with every quantity an exact integer.
   *
   * Exact contract: 100% INTEGER decision — C_k and C_n are exact
   * window sums, g_k one multiply-subtract per row (bound: max|C| ≤
   * (2⁶³−1)/(2n) ENFORCED plan-side via an overflow-free
   * integer-division compare, the cochranQ convention — the halved
   * bound caps each product n·C_k, k·C_n at (2⁶³−1)/2 so their
   * DIFFERENCE also stays in signed-64), the argmax a
   * struct-max over (g, −k) so ties break to the SMALLEST k in any
   * partition order. Only the two segment means divide (one IEEE
   * division each, GateRounded 6). Duplicate seq values are REFUSED
   * (the [[cusum]] rule — an ambiguous order is a different split
   * per run). Interior splits only (k < n); n = 1 groups emit
   * (nulls, 0.0 means, defined = false).
   *
   * Scale shape: one exchange on the group key + ONE in-partition
   * sort (prefix sum, row position, group totals and the duplicate
   * check share it), then one partial/final aggregate to |groups|
   * rows — the corpus never sorts globally, no joins except the
   * |groups|-row stats frame.
   *
   * @return (byCol, n, split_seq — the seq value AT the split (last
   *         row of the left segment), split_pos — its 1-based rank,
   *         g_stat — the exact integer max, mean_before, mean_after
   *         — GateRounded 6 — defined = n ≥ 2)
   */
  def changepointMean(df: DataFrame, byCol: String, seqCol: String,
                      xCol: String): DataFrame = {
    Seq(seqCol, xCol).foreach { c =>
      require(org.apache.spark.sql.graftbridge.ColumnBridge
          .isIntegral(df.schema(c).dataType),
        s"changepointMean: $c must be integral (got " +
          s"${df.schema(c).dataType.simpleString}) — the all-integer " +
          "contrast contract")
    }
    val clean = df.filter(col(byCol).isNotNull && col(seqCol).isNotNull &&
        col(xCol).isNotNull)
      .select(col(byCol).as("__g"), col(seqCol).cast("long").as("__i"),
        col(xCol).cast("long").as("__x"))
    import org.apache.spark.sql.expressions.Window
    val grp = Window.partitionBy(col("__g"))
    val ord = grp.orderBy(col("__i"))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the duplicate census rides the SAME g-exchange as the ordered
    // windows (the cusum convention — hash(g) satisfies the (g, i)
    // clustering, the (g, i) sort is shared): ONE data exchange
    val rows = clean.select(col("__g"), col("__i"),
      sum(col("__x")).over(cum).as("__c"),
      row_number().over(ord).cast("long").as("__k"),
      count(lit(1)).over(grp).as("__n"),
      sum(col("__x")).over(grp).as("__s"),
      count(lit(1)).over(Window.partitionBy(col("__g"), col("__i")))
        .as("__dup"))
    // |C| <= (2^63-1)/(2n) keeps not just the products n*C_k and
    // k*C_n exact but their DIFFERENCE: each product is bounded by
    // (2^63-1)/2, so |n*C_k - k*C_n| <= 2^63-1. (The former /n bound
    // covered only the two products — their contrast can reach 2x it
    // and die as an uncurated ANSI overflow.) floor(floor(M/2)/n) ==
    // floor(M/(2n)) for positive n, so the halved literal composes
    // with the integer division and the compare itself cannot
    // overflow.
    val cBound = call_function("div", lit(Long.MaxValue / 2),
      greatest(col("__n"), lit(1L)))
    val cOk = when(col("__dup") =!= 1L, raise_error(
        concat(lit("changepointMean: duplicate sequence value "),
          col("__i").cast("string"), lit(" in group "),
          col("__g").cast("string"),
          lit(" — the split position is ambiguous; dedupe upstream"))
      ).cast("long"))
      .when(abs(col("__c")) <= cBound, col("__c"))
      .otherwise(raise_error(concat(
        lit("changepointMean: group "), col("__g").cast("string"),
        lit(" prefix sum "), col("__c").cast("string"),
        lit(" exceeds (2^63-1)/(2n) — the n*C_k - k*C_n contrast " +
          "overflows signed-64; rescale x or shard the series"))))
    val interior = rows
      .select(col("__g"), col("__i"), col("__k"), col("__n"), col("__s"),
        cOk.as("__c"))
      .filter(col("__k") < col("__n"))
      .select(col("__g"),
        struct(
          abs(col("__n") * col("__c") - col("__k") * col("__s"))
            .as("g"),
          (-col("__k")).as("negk"), col("__i").as("i"),
          col("__c").as("c")).as("__cand"))
      .groupBy(col("__g"))
      .agg(max(col("__cand")).as("best"))
    val stats = clean.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("__sall"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val k = -col("best.negk")
    val joined = stats.join(interior, Seq("__g"), "left")
    val defined = col("n") >= 2L
    joined.select(col("__g").as(byCol), col("n"),
      when(defined, col("best.i")).otherwise(lit(null).cast("long"))
        .as("split_seq"),
      when(defined, k).otherwise(lit(null).cast("long")).as("split_pos"),
      when(defined, col("best.g")).otherwise(lit(null).cast("long"))
        .as("g_stat"),
      coalesce(when(defined, graft.functions.GateRound(
        d(col("best.c")) / d(k), 6)).otherwise(lit(0.0)), lit(0.0))
        .as("mean_before"),
      coalesce(when(defined, graft.functions.GateRound(
        d(col("__sall") - col("best.c")) / d(col("n") - k), 6))
        .otherwise(lit(0.0)), lit(0.0)).as("mean_after"),
      defined.as("defined"))
  }

  /**
   * Ordered k-step event funnel (the product-analytics staple:
   * view → click → purchase within a user's event stream) — for each
   * user, the EARLIEST strictly-increasing chain of step timestamps:
   * t₁ = min ts of step 1, tᵢ = min ts of step i with ts > tᵢ₋₁ (the
   * greedy chain, which is optimal: an earlier tᵢ₋₁ can only admit
   * more step-i candidates). `depth` = how far the user converted.
   *
   * Exact contract: timestamps are exact longs (µs-aligned ns — the
   * TimeSeries convention), every step is a min over exact values
   * with a STRICT > compare (a same-instant next step does not
   * convert — documented, deterministic), and null tᵢ₋₁ cascades
   * (when(ts > null) is null, so min stays null) — depth is the
   * count of non-null steps with no extra state.
   *
   * `maxSpan` (r19) bounds the WHOLE funnel to a conversion window
   * anchored at the first touch: step i ≥ 2 additionally requires
   * tᵢ ≤ t₁ + maxSpan ("purchase within X of the first view" — the
   * product-analytics conversion window, first-touch attribution).
   * Greedy stays OPTIMAL under this bound: given the anchor t₁, every
   * step window is (tᵢ₋₁, t₁ + maxSpan] — the upper end is FIXED by
   * the anchor, so choosing the EARLIEST valid tᵢ only ever widens
   * the next step's window (an earlier tᵢ admits a superset of
   * step-(i+1) candidates); by induction the greedy chain reaches the
   * maximal depth achievable from t₁. A per-step maxGap bound
   * (tᵢ ≤ tᵢ₋₁ + gap) deliberately does NOT exist here: its window
   * end moves WITH the greedy choice, and greedy is then wrong —
   * step-2 events at {1, 5}, a step-3 event at 14, gap 10: greedy
   * t₂ = 1 dead-ends (window (1, 11]) where t₂ = 5 converts — so a
   * gap-bounded funnel is a different (search, not fold) operator
   * and a silently-greedy one would under-report conversions.
   * The anchor itself is the global earliest step-1 event (first
   * touch, the attribution convention — documented, not searched).
   *
   * Scale shape: one (user) hash aggregate per step over the
   * step-filtered event stream, LEFT-joined back to the previous
   * step's |users|-row frame (user frames are aggregate-sized, never
   * event-sized; the events projection localCheckpoints against its
   * k consumers — the qCT lesson). No windows, no event-stream sort;
   * the span bound is one extra codegen'd compare per candidate.
   *
   * @return one row per user with ≥ 1 event: (userCol, t1..tk —
   *         nullable step timestamps — depth)
   */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String],
             maxSpan: Option[Long] = None): DataFrame = {
    maxSpan.foreach(s => require(s > 0, s"maxSpan must be positive, got $s"))
    require(steps.nonEmpty && steps.size <= 8,
      s"steps must be 1..8, got ${steps.size}")
    require(steps.distinct.size == steps.size,
      s"steps must be distinct, got $steps")
    val base = events.filter(col(userCol).isNotNull &&
        col(typeCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), col(typeCol).as("__t"),
        col(tsCol).cast("long").as("__ts"))
      .localCheckpoint(true) // k + 1 consumers: one per step + users
    var cur = base.filter(col("__t") === steps.head)
      .groupBy(col("__u")).agg(min(col("__ts")).as("t1"))
    for (i <- 2 to steps.size) {
      val carry = col("__u") +: (1 until i).map(j => col(s"t$j"))
      val inWindow = maxSpan match {
        case Some(s) => col("__ts") > col(s"t${i - 1}") &&
          col("__ts") <= col("t1") + lit(s)
        case None => col("__ts") > col(s"t${i - 1}")
      }
      cur = cur
        .join(base.filter(col("__t") === steps(i - 1)), Seq("__u"), "left")
        .groupBy(carry: _*)
        .agg(min(when(inWindow, col("__ts"))).as(s"t$i"))
    }
    val users = base.select(col("__u")).distinct()
    val depth = steps.indices
      .map(i => when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    users.join(cur, Seq("__u"), "left")
      .select((col("__u").as(userCol) +:
        steps.indices.map(i => col(s"t${i + 1}"))) :+
        depth.as("depth"): _*)
  }
}
