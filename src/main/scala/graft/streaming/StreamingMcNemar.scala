package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/**
 * Streaming McNemar monitor —
 * [[graft.operators.Preference.mcnemar]] lifted onto Structured
 * Streaming: paired (filter A, filter B, truth) verdicts arrive as a
 * labeling batch is graded, and per group the state holds the
 * RUNNING four-cell contingency, so every micro-batch reports the
 * paired-classifier statistic the batch audit would compute over
 * everything graded so far — a regressing replacement filter is
 * caught while the batch grades, not after.
 *
 * Float contract: the STATE is four longs (the suite rule); the
 * statistic (max(|b−c|−1, 0))²/(b+c) replays the batch integer
 * arithmetic with its ONE division (BigDecimal HALF_UP ≡ Spark
 * `round`) — streamed ≡ batch bit-for-bit at every prefix, pinned in
 * StreamingSpec. The boolean domain is enforced by the Dataset
 * encoder itself.
 *
 * Scale shape: state is four longs per GROUP; the stateful exchange
 * moves one (group, okA, okB) row per graded example.
 *
 * At-least-once caveat: a replayed micro-batch re-adds its examples;
 * run with exactly-once sinks (the [[StreamingHeavyHitters]]
 * convention).
 */
object StreamingMcNemar {

  /** @return Update-mode stream of (src, n, n_both_right, n_a_only,
    *         n_b_only, n_both_wrong, mcnemar, defined) — the batch
    *         [[graft.operators.Preference.mcnemar]] schema. */
  def mcnemar(resp: DataFrame, byCol: String, predACol: String,
              predBCol: String, truthCol: String): DataFrame = {
    val spark = resp.sparkSession
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    resp.filter(col(byCol).isNotNull && col(predACol).isNotNull &&
        col(predBCol).isNotNull && col(truthCol).isNotNull)
      .select(col(byCol).cast("string").as("g"),
        (col(predACol) === col(truthCol)).as("oa"),
        (col(predBCol) === col(truthCol)).as("ob"))
      .as[(String, Boolean, Boolean)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long, Long),
                          (String, Long, Long, Long, Long, Long, Double,
                            Boolean)](GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Boolean, Boolean)],
         state: org.apache.spark.sql.streaming.GroupState[
           (Long, Long, Long, Long)]) =>
          var (br, ao, bo, bw) = state.getOption.getOrElse((0L, 0L, 0L, 0L))
          rows.foreach { case (_, oa, ob) =>
            if (oa && ob) br += 1
            else if (oa && !ob) ao += 1
            else if (!oa && ob) bo += 1
            else bw += 1
          }
          state.update((br, ao, bo, bw))
          val bc = ao + bo
          val numi = math.max(math.abs(ao - bo) - 1L, 0L)
          val stat =
            if (bc > 0) r6((numi * numi).toDouble / bc.toDouble) else 0.0
          (g, br + ao + bo + bw, br, ao, bo, bw, stat, bc > 0)
      }
      .toDF("src", "n", "n_both_right", "n_a_only", "n_b_only",
        "n_both_wrong", "mcnemar", "defined")
  }
}
