package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/**
 * Streaming heavy-hitter monitoring — [[graft.operators.TextAnalysis.heavyGrams]]'s
 * candidate pass lifted onto Structured Streaming: each micro-batch
 * folds its token n-grams into a persistent [[graft.functions.MisraGries]]
 * summary, so at every point in time the state holds a PROVEN
 * superset of the φ-heavy grams of everything ingested so far (for
 * any φ with (k+1)·φ ≥ 1), with estimates undercounting by at most
 * N/(k+1) — the "what is trending in the ingest feed" probe that
 * needs no per-gram state.
 *
 * Scale shape: the summary is SHARDED by gram hash — a gram's whole
 * count lives in exactly one shard, so each shard is a faithful MG
 * over its own substream with the undercount bound N_shard/(k+1) ≤
 * N/(k+1), and the union of per-shard candidates is a superset of
 * the global φ-heavy set. State is `shards` × O(k) entries total and
 * the stateful exchange moves one (shard, gram) pair per gram; no
 * single-task global funnel. A consumer wanting the exact counts
 * re-counts the candidates against the lake, exactly like the batch
 * operator's verify pass.
 *
 * At-least-once caveat (unlike the md5-rank sampler, which absorbs
 * replays): a replayed micro-batch re-feeds its grams, inflating
 * estimates and totals — run with exactly-once sinks/checkpoints, or
 * treat the estimates as upper-biased under replay.
 *
 * Exactness bonus, pinned in StreamingSpec: while a shard has never
 * overflowed (`base == 0`), every stored count is the gram's EXACT
 * running frequency — small-cardinality feeds degrade gracefully
 * into plain exact counting.
 *
 * State-schema note: the persisted state embeds [[graft.functions.MisraGries.Buf]],
 * whose layout gained a `minStored` field (round 13) — a streaming
 * query checkpointed under the 2-field Buf cannot resume on this
 * code (Spark's state-schema compatibility check refuses); restart
 * from a fresh checkpoint. Future Buf changes carry the same cost —
 * prefer extending at the END of the case class and note it here.
 */
object StreamingHeavyHitters {

  /** @return Update-mode stream of (shard, summary, shard_total):
    *         each touched shard re-emits its current summary —
    *         (gram, est) pairs, best-first — and exact ingested-gram
    *         count per batch; the LAST emission per shard is current. */
  def heavyGrams(docs: DataFrame, textCol: String, n: Int, k: Int,
                 shards: Int = 8): DataFrame = {
    require(k > 0, "summary capacity k must be positive")
    require(shards > 0, "shard count must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val mg = new graft.functions.MisraGries(k)
    docs.select(explode(graft.functions.ShingleExprs
        .token_grams(col(textCol), n, overlapping = true)).as("gram"))
      .filter(col("gram").isNotNull)
      .select(pmod(xxhash64(col("gram")), lit(shards.toLong)).cast("int")
        .as("shard"), col("gram"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[(graft.functions.MisraGries.Buf, Long),
                          (Int, Seq[(String, Long)], Long)](
        GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[(Int, String)],
         state: org.apache.spark.sql.streaming.GroupState[
           (graft.functions.MisraGries.Buf, Long)]) =>
          var (buf, total) = state.getOption.getOrElse((mg.zero, 0L))
          rows.foreach { case (_, g) =>
            buf = mg.reduce(buf, g); total += 1
          }
          state.update((buf, total))
          (shard,
            buf.counts.toSeq
              .map { case (g, c) => (g, c - buf.base) }
              .sortBy { case (g, e) => (-e, g) },
            total)
      }
      .toDF("shard", "summary", "shard_total")
  }
}
