package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/**
 * Streaming length-bias monitor —
 * [[graft.operators.Preference.lengthBias]] lifted onto Structured
 * Streaming: preference pairs arrive as they are labeled (a reward-
 * model annotation pipeline emits continuously), and per group the
 * state holds the RUNNING exact-integer triple (n, ΣΔ, n_longer), so
 * at any point the emitted row is exactly what the batch audit would
 * report over everything ingested so far — verbosity bias is caught
 * while the labeling runs, not after the batch lands.
 *
 * Float contract: the STATE is integers only (the round-14 rule);
 * the emitted mean and fraction are each ONE division of exact
 * integers rounded 6, so streamed output ≡ batch output bit-for-bit
 * at every prefix — pinned in StreamingSpec. Only KEPT pairs count
 * (the batch filter); keep=false rows pass through the filter stage
 * and never touch state.
 *
 * Scale shape: state is three longs PER GROUP (sources/templates/
 * models — the same metadata-cardinality contract as
 * [[StreamingDrift]]); the stateful exchange moves one (group, Δ)
 * row per kept pair.
 *
 * At-least-once caveat: a replayed micro-batch re-adds its pairs;
 * run with exactly-once sinks (the [[StreamingHeavyHitters]]
 * convention).
 */
object StreamingLengthBias {

  /** @return Update-mode stream of (byCol, n_pairs, sum_delta,
    *         avg_delta, frac_chosen_longer) — the batch
    *         [[graft.operators.Preference.lengthBias]] schema. ONE
    *         deliberate difference: null-group pairs are EXCLUDED
    *         here (a null key through the typed state exchange is a
    *         reliability risk), while the batch groupBy reports a
    *         null-source row — coalesce the group column upstream if
    *         unattributed pairs must be monitored. */
  def lengthBias(pairs: DataFrame, byCol: String): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.filter(col("keep") && col(byCol).isNotNull)
      .select(col(byCol).cast("string").as("g"),
        col("delta_tokens").cast("long").as("d"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long),
                          (String, Long, Long, Double, Double)](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Long)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Long, Long)]) =>
          var (n, s, longer) = state.getOption.getOrElse((0L, 0L, 0L))
          rows.foreach { case (_, d) =>
            n += 1; s += d; if (d > 0) longer += 1
          }
          state.update((n, s, longer))
          // n ≥ 1 here (a group only fires on arrivals) — the two
          // divisions are the batch operator's, on exact integers
          (g, n, s,
            BigDecimal(s.toDouble / n)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
            BigDecimal(longer.toDouble / n)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .toDF(byCol, "n_pairs", "sum_delta", "avg_delta",
        "frac_chosen_longer")
  }
}
