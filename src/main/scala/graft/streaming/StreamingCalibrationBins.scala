package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/**
 * Streaming calibration monitor —
 * [[graft.operators.Preference.calibrationBins]] lifted onto
 * Structured Streaming: (confidence, outcome) pairs arrive as an
 * eval harness grades them, and per bin the state holds the RUNNING
 * exact-integer triple (n, Σoutcome, Σpct), so at any point the
 * emitted reliability row is exactly what the batch audit would
 * report over everything graded so far — a mis-calibrated reward
 * model is caught while the eval runs, not after the batch lands.
 *
 * Float contract: the STATE is integers only (the suite rule);
 * accuracy/confidence/gap are each ONE division (gap through abs) of
 * exact integers rounded 6 via BigDecimal HALF_UP — bit-equal to the
 * batch operator's Spark `round` at every prefix, pinned in
 * StreamingSpec. The bin key is computed with the SAME clamped
 * integer arithmetic as batch; out-of-range percents are refused by
 * the same loud error (a streaming monitor must not silently bend
 * the domain the batch operator refuses).
 *
 * Scale shape: state is three longs per BIN (≤ `bins` groups total —
 * strictly metadata); the stateful exchange moves one (bin, y, pct)
 * row per graded sample.
 *
 * At-least-once caveat: a replayed micro-batch re-adds its samples;
 * run with exactly-once sinks (the [[StreamingHeavyHitters]]
 * convention).
 */
object StreamingCalibrationBins {

  /** @return Update-mode stream of (bin, n, accuracy, confidence,
    *         gap) — the batch [[graft.operators.Preference
    *         .calibrationBins]] schema. */
  def calibrationBins(resp: DataFrame, pctCol: String, outcomeCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val spark = resp.sparkSession
    import spark.implicits._
    val pct = col(pctCol).cast("long")
    val guarded = when(pct >= 0 && pct <= 100, pct)
      .otherwise(raise_error(concat(
        lit("calibrationBins: percent out of [0, 100]: "),
        pct.cast("string"))))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    resp.filter(col(pctCol).isNotNull && col(outcomeCol).isNotNull)
      .select(least(floor(guarded * bins / lit(100)), lit(bins - 1))
          .cast("int").as("b"),
        when(col(outcomeCol), 1L).otherwise(0L).as("y"), guarded.as("p"))
      .as[(Int, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long),
                          (Int, Long, Double, Double, Double)](
        GroupStateTimeout.NoTimeout) {
        (bin: Int, rows: Iterator[(Int, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[
           (Long, Long, Long)]) =>
          var (n, sy, sp) = state.getOption.getOrElse((0L, 0L, 0L))
          rows.foreach { case (_, y, p) => n += 1; sy += y; sp += p }
          state.update((n, sy, sp))
          // n >= 1 here; the divisions are the batch operator's, on
          // exact integers
          (bin, n, r6(sy.toDouble / n), r6(sp.toDouble / (n * 100L)),
            r6(math.abs(sy.toDouble / n - sp.toDouble / (n * 100L))))
      }
      .toDF("bin", "n", "accuracy", "confidence", "gap")
  }
}
