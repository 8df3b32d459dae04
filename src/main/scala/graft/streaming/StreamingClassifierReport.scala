package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/**
 * Streaming classifier scorecard —
 * [[graft.operators.Classification.classifierReport]] lifted onto
 * Structured Streaming: (prediction, truth) verdicts arrive as a
 * filter grades live traffic, and per group the state holds the
 * RUNNING four-cell confusion matrix, so every micro-batch reports
 * the scorecard the batch audit would compute over everything graded
 * so far — a filter regressing on one slice is caught while the
 * grading runs.
 *
 * Float contract: the STATE is four longs (the suite rule); every
 * rate replays the batch dag on the exact cells (BigDecimal HALF_UP
 * ≡ Spark `round`), MCC through the same single-sqrt dag with the
 * −0.0 normalized away (gateRound) — streamed ≡ batch bit-for-bit
 * at every prefix, pinned in StreamingSpec.
 *
 * Scale shape: state is four longs per GROUP; the stateful exchange
 * moves one (group, okPred, okTruth) row per graded example.
 *
 * At-least-once caveat: a replayed micro-batch re-adds its examples;
 * run with exactly-once sinks (the [[StreamingHeavyHitters]]
 * convention).
 */
object StreamingClassifierReport {

  /** @return Update-mode stream matching the batch
    *         [[graft.operators.Classification.classifierReport]]
    *         schema. */
  def classifierReport(resp: DataFrame, byCol: String, predCol: String,
                       truthCol: String): DataFrame = {
    val spark = resp.sparkSession
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    resp.filter(col(byCol).isNotNull && col(predCol).isNotNull &&
        col(truthCol).isNotNull)
      .select(col(byCol).cast("string").as("g"), col(predCol).as("p"),
        col(truthCol).as("t"))
      .as[(String, Boolean, Boolean)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long, Long),
                          (String, Long, Long, Long, Long, Long, Double,
                            Double, Double, Double, Double, Double,
                            Boolean)](GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Boolean, Boolean)],
         state: org.apache.spark.sql.streaming.GroupState[
           (Long, Long, Long, Long)]) =>
          var (tp, fp, fn, tn) = state.getOption.getOrElse((0L, 0L, 0L, 0L))
          rows.foreach { case (_, p, t) =>
            if (p && t) tp += 1
            else if (p && !t) fp += 1
            else if (!p && t) fn += 1
            else tn += 1
          }
          state.update((tp, fp, fn, tn))
          val n = tp + fp + fn + tn
          def rate(num: Long, den: Long): Double =
            if (den > 0) r6(num.toDouble / den.toDouble) else 0.0
          val m1 = tp + fp; val m2 = tp + fn
          val m3 = tn + fp; val m4 = tn + fn
          val mccDef = m1 > 0 && m2 > 0 && m3 > 0 && m4 > 0
          val bal =
            if (m2 > 0 && m3 > 0)
              r6((tp.toDouble / m2.toDouble + tn.toDouble / m3.toDouble)
                / 2.0)
            else 0.0
          val mcc =
            if (mccDef)
              r6((tp * tn - fp * fn).toDouble /
                math.sqrt(m1.toDouble * m2.toDouble * m3.toDouble *
                  m4.toDouble)) + 0.0
            else 0.0
          (g, n, tp, fp, fn, tn, rate(tp + tn, n), rate(tp, m1),
            rate(tp, m2), rate(2 * tp, 2 * tp + fp + fn), bal, mcc, mccDef)
      }
      .toDF("src", "n", "tp", "fp", "fn", "tn", "accuracy", "precision",
        "recall", "f1", "balanced_accuracy", "mcc", "defined_mcc")
  }
}
