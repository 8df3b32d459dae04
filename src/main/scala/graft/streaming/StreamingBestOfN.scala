package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/**
 * Streaming best-of-n monitor — [[graft.operators.Preference.bestOfN]]'s
 * SELECTION lifted onto Structured Streaming: sampled responses arrive
 * as the reward model scores them, and per prompt the state holds the
 * same bounded best-first buffer the batch operator aggregates with
 * ([[graft.functions.TopKByScore]] — literally the same `reduce`, so
 * the ordering contract cannot drift between the two), emitting the
 * current top-n after every micro-batch. At any prefix the emitted
 * ranks are exactly the batch selection over everything ingested so
 * far — pinned bit-for-bit in StreamingSpec.
 *
 * Scope: selection only. The rank-1 near-dup guard and the carry
 * columns are batch concerns (they need the response TEXTS, which
 * must not ride a state store — the suite-wide payloads-out-of-state
 * rule); run the batch operator over the selected ids downstream.
 *
 * Scale shape: state is ≤ n (score, id) pairs + one count PER PROMPT;
 * the stateful exchange moves one (prompt, score, id) row per scored
 * response — texts never shuffle and never enter state.
 *
 * Contract differences from batch, documented like
 * [[StreamingLengthBias]]'s: the prompt key rides as its STRING form
 * (typed state exchange; cast back or join on the string form
 * downstream), scores are emitted as the heap's double (exact for
 * integral scores ≤ 2^53), and null-prompt rows are excluded.
 *
 * At-least-once caveat: a replayed micro-batch re-inserts its rows;
 * `n_resp` over-counts under replays (the top-n buffer itself is
 * idempotent to re-insertion of an id it already ranks ONLY if the
 * score is identical — exactly-once sinks, the
 * [[StreamingHeavyHitters]] convention).
 */
object StreamingBestOfN {

  /** @return Update-mode stream of (promptCol string, rank 1-based,
    *         resp_id, score double, n_resp) — the batch selection
    *         columns of [[graft.operators.Preference.bestOfN]]. */
  def bestOfN(resp: DataFrame, promptCol: String, respIdCol: String,
              scoreCol: String, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val spark = resp.sparkSession
    import spark.implicits._
    val heap = new graft.functions.TopKByScore(n)
    resp.filter(col(promptCol).isNotNull && col(respIdCol).isNotNull &&
        col(scoreCol).isNotNull)
      .select(col(promptCol).cast("string").as("g"),
        col(scoreCol).cast("double").as("s"),
        col(respIdCol).cast("long").as("i"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Seq[graft.functions.TopKByScore.In]),
                              (String, Int, Long, Double, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Double, Long)],
         state: org.apache.spark.sql.streaming.GroupState[
           (Long, Seq[graft.functions.TopKByScore.In])]) =>
          var (cnt, buf) = state.getOption
            .getOrElse((0L, Seq.empty[graft.functions.TopKByScore.In]))
          rows.foreach { case (_, s, i) =>
            cnt += 1
            buf = heap.reduce(buf, graft.functions.TopKByScore.In(s, i, 0L))
          }
          state.update((cnt, buf))
          buf.iterator.zipWithIndex.map { case (in, r) =>
            (g, r + 1, in.id, in.score, cnt)
          }
      }
      .toDF(promptCol, "rank", "resp_id", "score", "n_resp")
  }
}
