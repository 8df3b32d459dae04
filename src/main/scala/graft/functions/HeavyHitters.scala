package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * Misra–Gries frequent-items summary as a typed, MERGEABLE
 * `Aggregator` — the bounded-memory candidate generator behind
 * [[graft.operators.TextAnalysis.heavyGrams]].
 *
 * Why not `groupBy(gram).count()` directly: at 100 TB the distinct
 * n-gram space is billions of keys, so the exact aggregate shuffles
 * a corpus-cardinality hash table. This summary is k-bounded per
 * task: Spark plans the usual partial/final aggregate, each map task
 * reduces its slice to ≤ k entries, and only those cross the wire —
 * shuffle volume O(k × tasks), independent of gram cardinality.
 *
 * Correctness contract (Misra–Gries 1982; merge per Agarwal et al.
 * 2012, "Mergeable Summaries" — merging two summaries then trimming
 * to the k largest residuals preserves the bound): for a stream of
 * N items, every item's estimate undercounts its true frequency by
 * at most N/(k+1), so any item with true count > N/(k+1) is
 * guaranteed present. With k+1 ≥ 1/φ the summary is a GUARANTEED
 * SUPERSET of the φ-heavy hitters — callers re-count the ≤ k
 * candidates exactly and the final answer carries no approximation
 * at all (the sketch only bounds who needs re-counting).
 *
 * Buffer layout: absolute counts over a shared `base` offset
 * (effective count = stored − base). The classic decrement-all step
 * becomes `base += 1` plus dropping entries that hit the base.
 * `minStored` is a LOWER BOUND on the smallest stored count (only
 * insertions can lower the true minimum, so the bound survives
 * increments untouched): the eviction step scans the summary only
 * when `minStored` says some entry CAN hit the base, which keeps a
 * heavy-head-plus-long-tail stream — a full summary of high counts
 * absorbing a stream of strangers — at O(1) per element instead of a
 * drop-nothing O(k) filter per stranger.
 */
class MisraGries(k: Int)
    extends Aggregator[String, MisraGries.Buf, Seq[MisraGries.Hit]] {
  import MisraGries.{Buf, Hit}
  require(k > 0, "summary capacity k must be positive")

  override def zero: Buf = Buf(0L, Map.empty, Long.MaxValue)

  override def reduce(b: Buf, gram: String): Buf =
    b.counts.get(gram) match {
      case Some(c) => Buf(b.base, b.counts.updated(gram, c + 1), b.minStored)
      case None if b.counts.size < k =>
        Buf(b.base, b.counts.updated(gram, b.base + 1),
          math.min(b.minStored, b.base + 1))
      case None =>
        // full and unseen: decrement-all via the base offset; entries
        // whose count falls to the new base leave the summary. Skip
        // the scan entirely while the bound proves nothing can drop —
        // for the skip to ever fire, the filter branch must record the
        // TRUE minimum of the surviving map (the scan is already
        // paying O(k); a weak `nb + 1` bound here would stay forever
        // <= the next base and the guard would be dead code)
        val nb = b.base + 1
        if (b.minStored > nb) Buf(nb, b.counts, b.minStored)
        else {
          val kept = b.counts.filter(_._2 > nb)
          Buf(nb, kept,
            if (kept.isEmpty) Long.MaxValue else kept.valuesIterator.min)
        }
    }

  override def merge(a: Buf, b: Buf): Buf = {
    // sum effective counts over the key union…
    val summed = b.counts.foldLeft(
      a.counts.map { case (g, c) => g -> (c - a.base) }) {
      case (acc, (g, c)) => acc.updated(g, acc.getOrElse(g, 0L) + (c - b.base))
    }
    // …then trim to the k largest by subtracting the (k+1)-th largest
    // residual (the mergeable-summaries step: equivalent to that many
    // decrement-alls, so the N/(k+1) undercount bound telescopes)
    val trimmed =
      if (summed.size <= k) summed
      else {
        val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
        summed.collect { case (g, c) if c - cut > 0 => g -> (c - cut) }
      }
    Buf(0L, trimmed,
      if (trimmed.isEmpty) Long.MaxValue else trimmed.valuesIterator.min)
  }

  /** Candidates with their (under-)estimates, best-first; ties in
    * estimate break by gram for a deterministic output. */
  override def finish(b: Buf): Seq[Hit] =
    b.counts.toSeq.map { case (g, c) => Hit(g, c - b.base) }
      .sortBy(h => (-h.est, h.gram))

  override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
  override def outputEncoder: Encoder[Seq[Hit]] =
    ExpressionEncoder[Seq[Hit]]()
}

object MisraGries {
  /** `minStored` lower-bounds min(counts.values) — see class doc.
    *
    * COMPATIBILITY: this case class doubles as the persisted
    * streaming state of StreamingHeavyHitters, so ANY field change
    * (adding `minStored` in round 13 was one) is a checkpoint-schema
    * break — existing streams refuse to resume and need a fresh
    * checkpoint directory. Field changes here are therefore versioned
    * operational events, not refactors: either bump the checkpoint
    * dir convention (state-v2, the parquet-generation pattern of
    * ArtifactStore) or introduce a separate state case class for the
    * stream before touching this buffer again. */
  case class Buf(base: Long, counts: Map[String, Long], minStored: Long)
  case class Hit(gram: String, est: Long)
}
