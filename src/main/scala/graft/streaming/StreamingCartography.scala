package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/**
 * Streaming dataset-cartography monitor —
 * [[graft.operators.TrainingDynamics.cartography]] lifted onto
 * Structured Streaming: per-epoch (example, prob-percent, correct)
 * traces arrive as a training run logs them, and per example the
 * state holds the RUNNING exact-integer quadruple (n, Σp, Σp², Σc),
 * so at any point the emitted map row is exactly what the batch
 * audit would report over the epochs seen so far — the hard-to-learn
 * (mislabel-candidate) region is visible DURING the run, not after
 * the trace lands.
 *
 * Float contract: the STATE is integers only (the suite rule);
 * confidence / variability / correctness replay the batch divisions
 * on the exact integers (BigDecimal HALF_UP ≡ Spark `round`, the
 * StreamingLengthBias precedent), and the REGION boundaries are the
 * batch operator's integer compares — a boundary example classifies
 * identically streamed or batch. Out-of-[0,100] percents refuse via
 * the same loud error as batch.
 *
 * Scale shape: state is four longs per EXAMPLE; the stateful
 * exchange moves one (example, p, c) row per logged epoch. Example
 * cardinality is the corpus — size the state store accordingly or
 * watermark-expire finished examples downstream.
 *
 * At-least-once caveat: a replayed micro-batch re-adds its epochs;
 * run with exactly-once sinks (the [[StreamingHeavyHitters]]
 * convention).
 */
object StreamingCartography {

  /** @return Update-mode stream of (example, n_epochs, confidence,
    *         variability, correctness, region) — the batch
    *         [[graft.operators.TrainingDynamics.cartography]]
    *         schema. */
  def cartography(trace: DataFrame, exampleCol: String, probPctCol: String,
                  correctCol: String): DataFrame = {
    StreamingKeys.requireIntegral("StreamingCartography", trace, exampleCol)
    val spark = trace.sparkSession
    import spark.implicits._
    val p = col(probPctCol).cast("long")
    val guarded = when(p >= 0L && p <= 100L, p)
      .otherwise(raise_error(concat(
        lit("cartography: probability percent out of [0, 100]: "),
        p.cast("string"))))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    trace.filter(col(exampleCol).isNotNull && col(probPctCol).isNotNull &&
        col(correctCol).isNotNull)
      .select(col(exampleCol).cast("long").as("ex"), guarded.as("p"),
        when(col(correctCol), 1L).otherwise(0L).as("c"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long, Long),
                          (Long, Long, Double, Double, Double, String)](
        GroupStateTimeout.NoTimeout) {
        (ex: Long, rows: Iterator[(Long, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[
           (Long, Long, Long, Long)]) =>
          var (n, sp, spp, sc) = state.getOption.getOrElse((0L, 0L, 0L, 0L))
          rows.foreach { case (_, pv, cv) =>
            n += 1; sp += pv; spp += pv * pv; sc += cv
          }
          state.update((n, sp, spp, sc))
          // n >= 1 here; the batch dag on exact integers
          val vq = n * spp - sp * sp
          val region =
            if (vq >= 625L * n * n) "ambiguous"
            else if (2L * sp > 100L * n) "easy_to_learn"
            else "hard_to_learn"
          (ex, n, r6(sp.toDouble / (100.0 * n.toDouble)),
            r6(math.sqrt(vq.toDouble) / (100.0 * n.toDouble)),
            r6(sc.toDouble / n.toDouble), region)
      }
      .toDF("example", "n_epochs", "confidence", "variability",
        "correctness", "region")
  }
}
