package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/**
 * Streaming Cohen's-kappa monitor —
 * [[graft.operators.Preference.judgeAgreement]] lifted onto
 * Structured Streaming: double-judged items arrive as an ensemble
 * grades them, and per group the state holds the RUNNING exact 2×2
 * contingency (n, agree, a-positives, b-positives), so the emitted
 * κ at any point is exactly the batch audit over everything ingested
 * so far — a judge pair drifting toward chance agreement is caught
 * while the labeling runs.
 *
 * Float contract: the STATE is four longs (the round-14 rule); p_o
 * and p_e keep exact LONG numerators/denominators (a1·b1 +
 * (n−a1)·(n−b1) and n·n — the 2^53 bound is the batch operator's,
 * n < 9e7 per group), κ replays the batch association order
 * verbatim and normalizes the signed zero exactly as
 * [[graft.functions.GateRound]] (HALF_UP + 0.0) — streamed ≡ batch
 * bit-for-bit at every prefix, pinned in StreamingSpec. Degenerate
 * prefixes (p_e = 1 — both judges constant so far) emit κ = 0 with
 * defined = false, exactly like batch.
 *
 * Scale shape: state is four longs PER GROUP (metadata
 * cardinality); the stateful exchange moves one (group, a, b)
 * boolean row per item.
 *
 * At-least-once caveat: counters — run with exactly-once sinks (the
 * [[StreamingHeavyHitters]] convention).
 */
object StreamingJudgeAgreement {

  /** @return Update-mode stream of (byCol string, n, n_agree, kappa,
    *         defined) — the batch schema; null-group rows excluded
    *         (the [[StreamingLengthBias]] typed state-exchange
    *         contract). */
  def judgeAgreement(resp: DataFrame, byCol: String, judgeACol: String,
                     judgeBCol: String): DataFrame = {
    val spark = resp.sparkSession
    import spark.implicits._
    resp.filter(col(byCol).isNotNull && col(judgeACol).isNotNull &&
        col(judgeBCol).isNotNull)
      .select(col(byCol).cast("string").as("g"),
        col(judgeACol).cast("boolean").as("a"),
        col(judgeBCol).cast("boolean").as("b"))
      .as[(String, Boolean, Boolean)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long, Long),
                          (String, Long, Long, Double, Boolean)](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Boolean, Boolean)],
         state: org.apache.spark.sql.streaming.GroupState[
           (Long, Long, Long, Long)]) =>
          var (n, agree, a1, b1) = state.getOption
            .getOrElse((0L, 0L, 0L, 0L))
          rows.foreach { case (_, a, b) =>
            n += 1
            if (a == b) agree += 1
            if (a) a1 += 1
            if (b) b1 += 1
          }
          state.update((n, agree, a1, b1))
          // the batch operator's arithmetic verbatim: exact LONG
          // numerators, one division each, the same association order
          val po = agree.toDouble / n.toDouble
          val pe = (a1 * b1 + (n - a1) * (n - b1)).toDouble /
            (n * n).toDouble
          val defined = n > 0 && pe < 1.0
          val kappa =
            if (!defined) 0.0
            else BigDecimal((po - pe) / (1.0 - pe))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble + 0.0
          (g, n, agree, kappa, defined)
      }
      .toDF(byCol, "n", "n_agree", "kappa", "defined")
  }
}
