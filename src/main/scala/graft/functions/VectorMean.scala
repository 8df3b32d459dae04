package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed element-wise vector mean — the `Aggregator[IN, BUF, OUT]`
 * face of the UDAF surface (SURVEY.md §2.2 "UDF/UDAF/UDTF"): a
 * partial-aggregable centroid computation. The buffer is a running
 * (sum-vector, count) pair, so Spark plans it as the usual
 * partial/final hash aggregate — map-side combine, one shuffle of
 * `dim` doubles per group, never the raw vectors.
 */
class VectorMean(dim: Int)
    extends Aggregator[Seq[Double], VectorMean.Buf, Seq[Double]] {
  import VectorMean.Buf

  override def zero: Buf = Buf(new Array[Double](dim), 0L)

  override def reduce(b: Buf, v: Seq[Double]): Buf = {
    var i = 0
    val n = math.min(dim, v.size)
    while (i < n) { b.sums(i) += v(i); i += 1 }
    b.copy(count = b.count + 1)
  }

  override def merge(a: Buf, b: Buf): Buf = {
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    a.copy(count = a.count + b.count)
  }

  override def finish(b: Buf): Seq[Double] =
    if (b.count == 0) Seq.fill(dim)(0.0)
    else b.sums.map(_ / b.count).toSeq

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object VectorMean {
  case class Buf(sums: Array[Double], count: Long)
}

/** Typed element-wise LONG vector sum — the counting sibling of
  * [[VectorMean]]: partial/final over `dim` longs per task, used to
  * reduce per-document bucket-count vectors ([[BucketCounts]]) into a
  * corpus model without ever exploding the token stream. Inputs
  * shorter than `dim` contribute their prefix; null inputs contribute
  * nothing. */
class LongVectorSum(dim: Int)
    extends Aggregator[Seq[Long], LongVectorSum.Buf, Seq[Long]] {
  import LongVectorSum.Buf
  require(dim > 0, "dim must be positive")

  override def zero: Buf = Buf(new Array[Long](dim))

  // addExact, not +: a web-scale bucket of unit-scale 1e-9-grid
  // coordinates wraps a raw long sum near 9.2e9 rows — the r19 audit
  // rule is that every cross-entity grid sum either carries a proved
  // bound or fails LOUDLY, never wraps (SCALE.md "Grid-sum audit")
  override def reduce(b: Buf, v: Seq[Long]): Buf = {
    if (v != null) {
      var i = 0
      val n = math.min(dim, v.size)
      while (i < n) { b.sums(i) = Math.addExact(b.sums(i), v(i)); i += 1 }
    }
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    var i = 0
    while (i < dim) { a.sums(i) = Math.addExact(a.sums(i), b.sums(i)); i += 1 }
    a
  }

  override def finish(b: Buf): Seq[Long] = b.sums.toSeq

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object LongVectorSum {
  case class Buf(sums: Array[Long])
}
