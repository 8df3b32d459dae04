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
}
