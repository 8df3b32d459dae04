package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Bounded per-group top-k as a typed `Aggregator` — the scale-correct
 * replacement for `row_number().over(Window.partitionBy(g))` + filter
 * when only the k best rows of each group survive.
 *
 * The window form shuffles EVERY candidate row to its group's
 * partition and sorts the whole group before discarding all but k; a
 * 100 TB candidate stream with a 1000-group batch moves 100 TB to
 * produce k·1000 rows. This aggregator keeps a k-bounded, best-first
 * buffer per group, so Spark plans the usual partial/final hash
 * aggregate: each map task reduces its slice to ≤ k entries per group
 * and only those cross the wire — shuffle volume is O(groups × k ×
 * tasks), independent of the candidate count.
 *
 * Ordering contract (must match any SQL `row_number` oracle):
 * higher `score` first, ties broken by ascending `id`. Scores are
 * compared exactly as passed — pre-round them if the consumer
 * compares against a rounded oracle. NaN scores sort LAST (never
 * enter a full buffer ahead of real scores), unlike Spark's
 * NaN-is-largest ordering — callers filtering degenerate vectors
 * up front see no difference.
 */
class TopKByScore(k: Int)
    extends Aggregator[TopKByScore.In, Seq[TopKByScore.In], Seq[TopKByScore.In]] {
  import TopKByScore.In
  require(k > 0, "k must be positive")

  /** Strict "a ranks strictly better than b" — the companion's
    * [[TopKByScore.ranksBetter]], the single source of the ordering. */
  private def better(a: In, b: In): Boolean = TopKByScore.ranksBetter(a, b)

  private def insert(buf: Seq[In], in: In): Seq[In] =
    if (buf.length >= k && !better(in, buf.last)) buf
    else {
      val (pre, post) = buf.span(better(_, in))
      ((pre :+ in) ++ post).take(k)
    }

  override def zero: Seq[In] = Vector.empty
  override def reduce(buf: Seq[In], in: In): Seq[In] = insert(buf, in)
  override def merge(a: Seq[In], b: Seq[In]): Seq[In] = b.foldLeft(a)(insert)
  override def finish(r: Seq[In]): Seq[In] = r

  override def bufferEncoder: Encoder[Seq[In]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[In]]()
  override def outputEncoder: Encoder[Seq[In]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[In]]()
}

object TopKByScore {
  /** One scored candidate: `id` is the candidate's identity (and the
    * tie-break), `tag` carries a small caller payload (e.g. a label). */
  case class In(score: Double, id: Long, tag: Long)

  /** The buffer's strict ordering — "a ranks strictly better than b":
    * higher score first, ties by ascending id, NaN scores last.
    * Exposed so stateful consumers (the streaming best-of-n fold's
    * dedup-by-id) compare with the aggregator's EXACT contract rather
    * than a replica that could drift. An identical (score, id) pair is
    * neither better nor worse than its copy — which is why a replayed
    * insert must dedup by id BEFORE calling `reduce` (the buffer
    * itself never inspects ids for identity). */
  def ranksBetter(a: In, b: In): Boolean =
    if (a.score.isNaN && b.score.isNaN) a.id < b.id
    else if (a.score.isNaN) false
    else if (b.score.isNaN) true
    else if (a.score != b.score) a.score > b.score
    else a.id < b.id
}
