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
 * At-least-once caveat: the top-n buffer is replay-safe — the state
 * fold DEDUPS BY ID before every insert (a replayed (score, id) row
 * finds its existing copy removed first and re-ranks to the same
 * slot; a re-scored id keeps the better of the two entries), because
 * [[graft.functions.TopKByScore]]'s ordering is strict and would
 * otherwise rank an identical replayed pair BESIDE its copy,
 * evicting a distinct response. `n_resp` still over-counts under
 * replays (an exact count would need every seen id in state — the
 * payloads-out-of-state rule's counting analogue); pair it with
 * exactly-once sinks where `n_resp` must be exact (the
 * [[StreamingHeavyHitters]] convention).
 */
object StreamingBestOfN {

  /** @return Update-mode stream of (promptCol string, rank 1-based,
    *         resp_id, score double, n_resp) — the batch selection
    *         columns of [[graft.operators.Preference.bestOfN]]. */
  def bestOfN(resp: DataFrame, promptCol: String, respIdCol: String,
              scoreCol: String, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    StreamingKeys.requireIntegral("StreamingBestOfN", resp, respIdCol)
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
            val in = graft.functions.TopKByScore.In(s, i, 0L)
            // dedup-by-id BEFORE insert: a replayed micro-batch
            // re-delivers (s, i); the heap's strict ordering would
            // rank the copy beside the original and evict a distinct
            // response. Keep the better entry when an id re-arrives
            // with a different score (a reward-model re-grade).
            val (dup, rest) = buf.partition(_.id == i)
            val winner = dup.foldLeft(in) { (best, old) =>
              if (graft.functions.TopKByScore.ranksBetter(old, best)) old
              else best
            }
            buf = heap.reduce(rest, winner)
          }
          state.update((cnt, buf))
          buf.iterator.zipWithIndex.map { case (in, r) =>
            (g, r + 1, in.id, in.score, cnt)
          }
      }
      .toDF(promptCol, "rank", "resp_id", "score", "n_resp")
  }
}
