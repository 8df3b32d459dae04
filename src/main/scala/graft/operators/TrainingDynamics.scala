package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Training-dynamics analytics — operators over per-example,
 * per-epoch model traces (the "what did training think of this
 * example" axis the static quality battery in [[TextAnalysis]]
 * cannot see). The reference engine has no training-dynamics
 * operators (gigapi-querier's surface is SQL passthrough,
 * `querier/query.go:1`); this family exists for the training-data
 * pipeline bar.
 */
object TrainingDynamics {

  /**
   * Dataset cartography (Swayamdipta et al. 2020, "Dataset
   * Cartography: Mapping and Diagnosing Datasets with Training
   * Dynamics"): per example across its training epochs —
   * `confidence` (mean gold-label probability), `variability`
   * (population std of that probability), `correctness` (fraction of
   * epochs predicted right) — and the paper's three regions:
   * high-variability examples are AMBIGUOUS (the ones worth
   * keeping), low-variability high-confidence are EASY_TO_LEARN
   * (compressible), low-variability low-confidence are HARD_TO_LEARN
   * (the mislabel-candidate pool to audit before training on).
   *
   * Exact contract: probabilities arrive as integer PERCENT
   * (the qC8 calibration-domain convention) — out-of-[0,100] REFUSED
   * loudly in the plan via raise_error, a float probability refused
   * at entry — so n, Σp, Σp², Σcorrect are exact longs in any
   * partition order (the qC1 GRPO moment shape). confidence and
   * correctness are ONE division each; variability is
   * √(n·Σp² − (Σp)²) / (100·n) — the radicand an exact long, one
   * sqrt, one division (plain round: all three are non-negative).
   * REGION BOUNDARIES ARE INTEGER COMPARISONS, not float thresholds:
   * ambiguous ⇔ n·Σp² − (Σp)² ≥ 625·n² (i.e. variability ≥ 0.25)
   * and high-confidence ⇔ 2·Σp > 100·n (i.e. confidence > 0.5) —
   * an example sitting exactly on a boundary classifies identically
   * on every engine and partition order.
   *
   * Scale shape: ONE partial/final hash aggregate to |examples| rows
   * — no windows, no joins, no per-epoch state. The 2^53 bound is
   * n_epochs·(100)² per example — unreachable (10⁹ epochs would be
   * needed).
   *
   * @param probPctCol gold-label probability as integer percent 0–100
   * @param correctCol boolean — epoch's argmax prediction was right
   * @return (exampleCol, n_epochs, confidence rounded 6, variability
   *         rounded 6, correctness rounded 6, region)
   */
  def cartography(trace: DataFrame, exampleCol: String,
                  probPctCol: String, correctCol: String): DataFrame = {
    require(org.apache.spark.sql.graftbridge.ColumnBridge
        .isIntegral(trace.schema(probPctCol).dataType),
      s"cartography: $probPctCol must be integral percent (got " +
        s"${trace.schema(probPctCol).dataType.simpleString}) — quantize " +
        "probabilities to integer percent upstream (the exact-moment " +
        "contract)")
    require(trace.schema(correctCol).dataType ==
        org.apache.spark.sql.types.BooleanType,
      s"cartography: $correctCol must be boolean (got " +
        s"${trace.schema(correctCol).dataType.simpleString})")
    val p = col(probPctCol).cast("long")
    val guarded = when(p >= 0L && p <= 100L, p)
      .otherwise(raise_error(concat(
        lit("cartography: probability percent out of [0, 100]: "),
        p.cast("string"),
        lit(" — a probability cannot leave the unit interval; fix the " +
          "trace upstream rather than silently clamping"))))
    val stats = trace.filter(col(exampleCol).isNotNull &&
        col(probPctCol).isNotNull && col(correctCol).isNotNull)
      .groupBy(col(exampleCol))
      .agg(count(lit(1)).as("n_epochs"),
        sum(guarded).as("__sp"),
        sum(guarded * guarded).as("__spp"),
        sum(when(col(correctCol), 1L).otherwise(0L)).as("__sc"))
    val n = col("n_epochs")
    val varq = n * col("__spp") - col("__sp") * col("__sp")
    val nd = n.cast("double")
    stats.select(col(exampleCol), col("n_epochs"),
      round(col("__sp").cast("double") / (lit(100.0) * nd), 6)
        .as("confidence"),
      round(sqrt(varq.cast("double")) / (lit(100.0) * nd), 6)
        .as("variability"),
      round(col("__sc").cast("double") / nd, 6).as("correctness"),
      when(varq >= lit(625L) * n * n, lit("ambiguous"))
        .when(lit(2L) * col("__sp") > lit(100L) * n, lit("easy_to_learn"))
        .otherwise(lit("hard_to_learn")).as("region"))
  }

  /**
   * Cluster–label agreement audit: purity and normalized mutual
   * information between a clustering (e.g. the [[Similarity]]
   * centroid assignments, a dedup component id) and an external
   * label (source, language, topic) — the standard external
   * validation pair (Manning et al. 2008 §16.3: purity alone rewards
   * shattering into singletons; NMI's normalization is the fix, so
   * the two are reported together). "Did my embedding clusters just
   * rediscover the source field" is this audit.
   *
   * Exact contract: the (cluster, label) contingency and all
   * marginals are exact longs in any partition order. Purity =
   * Σ_c max_l n_cl / n — integer maxes, ONE division. Each MI term
   * (n_cl/n)·ln(n·n_cl/(n_c·n_l)) and each entropy term
   * −(n_c/n)·ln(n_c/n) is ONE shared dag over exact longs quantized
   * to a 1e-9-grid long (the qCC axis) — the cross-cell sums are
   * exact integers in any partition order; NMI = I/√(H_C·H_L) is a
   * fixed dag over the three quantized sums. MI is analytically ≥ 0
   * but quantization residue can land at −ε → gateRounded (NMI
   * likewise). A single-cluster or single-label input has a zero
   * entropy → NMI undefined (defined = false), purity still
   * reported.
   *
   * Scale shape: one corpus partial/final aggregate to the
   * |clusters|·|labels| contingency; every later step re-aggregates
   * that metadata-sized frame (localCheckpointed — four consumers).
   *
   * @return ONE row: (n, n_clusters, n_labels, purity rounded 6,
   *         mi_nats rounded 6, nmi rounded 6, defined)
   */
  def clusterLabelAgreement(assign: DataFrame, clusterCol: String,
                            labelCol: String): DataFrame = {
    val cells = assign.filter(col(clusterCol).isNotNull &&
        col(labelCol).isNotNull)
      .groupBy(col(clusterCol).cast("string").as("__c"),
        col(labelCol).cast("string").as("__l"))
      .agg(count(lit(1)).as("__ncl"))
      .localCheckpoint(true) // contingency-sized, four consumers
    val byC = cells.groupBy(col("__c")).agg(sum(col("__ncl")).as("__nc"),
      max(col("__ncl")).as("__mx"))
    val byL = cells.groupBy(col("__l")).agg(sum(col("__ncl")).as("__nl"))
    val tot = byC.agg(coalesce(sum(col("__nc")), lit(0L)).as("__n"),
      coalesce(sum(col("__mx")), lit(0L)).as("__pur"),
      count(lit(1)).as("n_clusters"))
    val nd = col("__n").cast("double")
    def q(t: org.apache.spark.sql.Column) =
      floor(t * lit(1e9) + lit(0.5)).cast("long")
    val mi = cells.join(byC.select(col("__c"), col("__nc")), Seq("__c"))
      .join(byL, Seq("__l")).crossJoin(broadcast(tot))
      .select(q(col("__ncl").cast("double") / nd *
        log(nd * col("__ncl").cast("double") /
          (col("__nc").cast("double") * col("__nl").cast("double"))))
        .as("__t"))
      .agg(coalesce(sum(col("__t")), lit(0L)).as("__miq"))
    // every scalar stays IN the plan as a single-row cross (the qC5
    // lesson: an eager first()/count() at construction time executes
    // jobs before the caller asked for any)
    def entropy(m: DataFrame, cnt: String, out: String) =
      m.crossJoin(broadcast(tot.select(col("__n"))))
        .select(q(lit(-1.0) * (col(cnt).cast("double") / nd) *
          log(col(cnt).cast("double") / nd)).as("__t"))
        .agg(coalesce(sum(col("__t")), lit(0L)).as(out))
    val hcF = entropy(byC.select(col("__nc")), "__nc", "__hcq")
    val hlF = entropy(byL.select(col("__nl")), "__nl", "__hlq")
    val labF = byL.agg(count(lit(1)).as("n_labels"))
    val iNats = col("__miq").cast("double") / lit(1e9)
    val nmi = iNats / sqrt((col("__hcq").cast("double") / lit(1e9)) *
      (col("__hlq").cast("double") / lit(1e9)))
    val defined = col("__n") > 0 && col("__hcq") > 0L && col("__hlq") > 0L
    mi.crossJoin(tot).crossJoin(hcF).crossJoin(hlF).crossJoin(labF)
      .select(col("__n").as("n"), col("n_clusters"), col("n_labels"),
        when(col("__n") > 0, round(col("__pur").cast("double") / nd, 6))
          .otherwise(lit(0.0)).as("purity"),
        when(col("__n") > 0,
          graft.functions.GateRound(iNats, 6)).otherwise(lit(0.0))
          .as("mi_nats"),
        when(defined, graft.functions.GateRound(nmi, 6)).otherwise(lit(0.0))
          .as("nmi"),
        defined.as("defined"))
  }
}
