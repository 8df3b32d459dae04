package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/**
 * Streaming pass@k monitor — [[graft.operators.Preference.passAtK]]
 * lifted onto Structured Streaming: verifier verdicts arrive as the
 * sampler emits responses (a unit-test harness grades continuously),
 * and per prompt the state holds the RUNNING exact-integer pair
 * (n, c), so the emitted row at any point is exactly what the batch
 * estimator would report over everything ingested so far — a
 * collapsing pass rate is caught while sampling runs.
 *
 * Float contract: the STATE is two longs (the round-14 rule); the
 * emitted pass@1 is one division + HALF_UP round and pass@k replays
 * the batch product fold VERBATIM — the same left-assoc
 * ((n−c)−j)/(n−j) factors from the same exact integers, 1.0 identity
 * start — so streamed ≡ batch bit-for-bit at every prefix (pinned in
 * StreamingSpec). The paper's domain guards hold at every prefix
 * too: n < k → null (never a silently clamped k), n−c < k → exact
 * 1.0.
 *
 * Scale shape: state is two longs PER PROMPT; the stateful exchange
 * moves one (prompt, passed) row per verdict — response payloads
 * never enter state.
 *
 * At-least-once caveat: a replayed micro-batch re-adds its verdicts
 * ((n, c) are counters — a duplicate is indistinguishable from a new
 * verdict); run with exactly-once sinks (the
 * [[StreamingHeavyHitters]] convention).
 */
object StreamingPassAtK {

  /** @return Update-mode stream of (promptCol string, n_resp,
    *         n_passed, pass_at_1, pass_at_k, k) — the batch schema.
    *         The prompt key rides as its STRING form and null-prompt
    *         rows are excluded (the [[StreamingLengthBias]] typed
    *         state-exchange contract). */
  def passAtK(resp: DataFrame, promptCol: String, passedCol: String,
              k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = resp.sparkSession
    import spark.implicits._
    resp.filter(col(promptCol).isNotNull && col(passedCol).isNotNull)
      .select(col(promptCol).cast("string").as("g"),
        col(passedCol).cast("boolean").as("y"))
      .as[(String, Boolean)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long),
                          (String, Long, Long, Double, Option[Double], Int)](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Boolean)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Long)]) =>
          var (n, c) = state.getOption.getOrElse((0L, 0L))
          rows.foreach { case (_, y) => n += 1; if (y) c += 1 }
          state.update((n, c))
          val nd = n.toDouble
          val cd = c.toDouble
          // the batch operator's expressions verbatim: one division
          // for pass@1; the k-factor product in the same left-assoc
          // fold from the 1.0 identity
          val p1 = BigDecimal(cd / nd)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          val pk: Option[Double] =
            if (n < k) None
            else if (n - c < k) Some(1.0)
            else {
              val prod = (0 until k).foldLeft(1.0) { (acc, j) =>
                acc * ((nd - cd - j.toDouble) / (nd - j.toDouble))
              }
              Some(BigDecimal(1.0 - prod)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
            }
          (g, n, c, p1, pk, k)
      }
      .toDF(promptCol, "n_resp", "n_passed", "pass_at_1", "pass_at_k",
        "k")
  }
}
