package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * One-pass first+second vector moments — the distributed half of PCA
 * ([[graft.operators.Pca]]): the buffer carries Σx (dim doubles), the
 * packed upper triangle of Σxxᵀ (dim·(dim+1)/2 doubles), and the
 * count, so Spark plans the usual partial/final hash aggregate — the
 * corpus is read ONCE and only O(dim²) doubles per task cross the
 * wire, never the vectors.
 *
 * The dim² buffer is the scale knob: 64-dim embeddings cost 2 KB ×
 * 8 B per task; the constructor refuses dims whose triangle exceeds
 * 2²² doubles (32 MB/task) — beyond that, covariance estimation
 * should subsample rows or reduce dims first, not melt the shuffle.
 *
 * Inputs shorter than `dim`, null, or containing no elements are
 * skipped whole (a partial vector would silently shear the
 * covariance). Accumulation order varies with partitioning — the
 * usual float-sum envelope; consumers round or tolerate ulps.
 */
class SecondMoments(dim: Int)
    extends Aggregator[Seq[Double], SecondMoments.Buf, SecondMoments.Moments] {
  import SecondMoments.{Buf, Moments}
  require(dim > 0, "dim must be positive")
  require(dim.toLong * (dim + 1) / 2 <= (1L << 22),
    s"dim = $dim: the second-moment triangle exceeds the per-task bound; " +
      "subsample or reduce dimensionality upstream")

  private val tri = dim * (dim + 1) / 2

  override def zero: Buf = Buf(new Array[Double](dim), new Array[Double](tri), 0L)

  override def reduce(b: Buf, v: Seq[Double]): Buf = {
    if (v != null && v.size >= dim) {
      // index once into a local array — Seq#apply may be O(n)
      val x = new Array[Double](dim)
      var i = 0
      while (i < dim) { x(i) = v(i); i += 1 }
      var k = 0
      i = 0
      while (i < dim) {
        b.sums(i) += x(i)
        var j = i
        while (j < dim) { b.xx(k) += x(i) * x(j); j += 1; k += 1 }
        i += 1
      }
      b.copy(count = b.count + 1)
    } else b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    i = 0
    while (i < tri) { a.xx(i) += b.xx(i); i += 1 }
    a.copy(count = a.count + b.count)
  }

  override def finish(b: Buf): Moments =
    Moments(b.count, b.sums.toSeq, b.xx.toSeq)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
}

object SecondMoments {
  case class Buf(sums: Array[Double], xx: Array[Double], count: Long)
  /** n, Σx, packed upper triangle of Σxxᵀ (row-major, j ≥ i). */
  case class Moments(n: Long, sums: Seq[Double], xx: Seq[Double])
}
