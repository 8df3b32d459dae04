package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * One-pass EXACT integer vector moments — [[SecondMoments]]'s
 * fixed-point twin, the distributed half of
 * [[graft.operators.Pca.eigenExact]] / `powerIteration`: the buffer
 * carries the count, per-dim sums Σx, and the packed upper triangle
 * of the gram Σxxᵀ, every cell an exact signed INT128 (hi/lo long
 * pairs with two's-complement carry propagation), so the result is
 * bit-identical in any partition order — the property the qCJ/qE7
 * hash oracles replay as HUGEINT CTEs.
 *
 * This replaces the double-`posexplode` gram formulation, which
 * generated n·dim² rows (4096× row amplification at dim 64) before
 * the hash aggregate collapsed them: here every row pays ONE buffer
 * update (dim²/2 long multiplies + int128 adds), only O(dim²) longs
 * per task cross the wire, and the vectors never shuffle. The same
 * pass also yields the sums, the count, and the corpus dimension, so
 * the callers' separate dims-distinct and sums scans collapse into
 * this one read.
 *
 * Contract: inputs are 1e-6-quantized longs (|x| ≤ 1e7 — the callers'
 * raise_error guard), so per-row products ≤ 1e14 are long-exact and
 * the int128 accumulators hold ≥ 1.7e24 rows — no row ceiling in
 * practice (the old long-sum gram wrapped at ~9e6 rows; the
 * DECIMAL(38,0) variant was exact but paid the row explosion).
 * Callers with other grids must keep |x| ≤ 3e9 so products stay
 * signed-64.
 *
 * Ragged corpora are refused LOUDLY (a silent skip would shear the
 * scatter matrix): the first row fixes the dimension lazily, any
 * mismatch in reduce/merge throws `mixed dimensions`, and dims
 * outside [1, maxDim] throw before the buffer allocates. Callers
 * unwrap these from the SparkException chain and rethrow
 * IllegalArgumentException (the driver-visible refusal contract).
 * An all-null/empty corpus finishes with dim = −1, count = 0.
 *
 * Output crosses as decimal-digit strings (one per cell): int128
 * exceeds every numeric Spark type except strings/DECIMAL(38), and
 * the single final row is driver metadata.
 */
class ExactMoments(label: String, maxDim: Int)
    extends Aggregator[Seq[Long], ExactMoments.Buf, ExactMoments.Result] {
  import ExactMoments.{Buf, Result}
  require(maxDim >= 1 && maxDim.toLong * (maxDim + 1) / 2 <= (1L << 22),
    s"maxDim = $maxDim: the gram triangle exceeds the per-task bound")

  override def zero: Buf =
    Buf(-1, 0L, Array.empty, Array.empty, Array.empty, Array.empty)

  override def reduce(b: Buf, v: Seq[Long]): Buf = {
    if (v == null) b
    else {
      val d = v.size
      if (d < 1 || d > maxDim)
        throw new IllegalArgumentException(
          s"$label: dim $d outside [1, $maxDim] — the gram buffer is " +
            "dim^2 per task; project first (JL/PCA) or raise maxDim")
      if (b.dim != -1 && b.dim != d)
        throw new IllegalArgumentException(
          s"$label: mixed dimensions ${math.min(b.dim, d)},${math.max(b.dim, d)} — " +
            "a ragged corpus would silently skew the scatter matrix")
      val t = d * (d + 1) / 2
      val b2 =
        if (b.dim == -1)
          Buf(d, 0L, new Array[Long](d), new Array[Long](d),
            new Array[Long](t), new Array[Long](t))
        else b
      // index once into a local array — Seq#apply may be O(n)
      val x = new Array[Long](d)
      var i = 0
      while (i < d) { x(i) = v(i); i += 1 }
      var k = 0
      i = 0
      while (i < d) {
        add128(b2.sHi, b2.sLo, i, x(i))
        var j = i
        while (j < d) { add128(b2.gHi, b2.gLo, k, x(i) * x(j)); j += 1; k += 1 }
        i += 1
      }
      b2.copy(count = b2.count + 1)
    }
  }

  override def merge(a: Buf, b: Buf): Buf =
    if (a.dim == -1) b
    else if (b.dim == -1) a
    else if (a.dim != b.dim)
      throw new IllegalArgumentException(
        s"$label: mixed dimensions ${math.min(a.dim, b.dim)},${math.max(a.dim, b.dim)} — " +
          "a ragged corpus would silently skew the scatter matrix")
    else {
      merge128(a.sHi, a.sLo, b.sHi, b.sLo)
      merge128(a.gHi, a.gLo, b.gHi, b.gLo)
      a.copy(count = a.count + b.count)
    }

  override def finish(b: Buf): Result =
    if (b.dim == -1) Result(0L, -1, Nil, Nil)
    else Result(b.count, b.dim, toBig(b.sHi, b.sLo), toBig(b.gHi, b.gLo))

  /** 128-bit += of a sign-extended 64-bit addend: unsigned carry out
    * of the low limb plus the addend's sign extension into the high. */
  @inline private def add128(hi: Array[Long], lo: Array[Long], k: Int,
                             p: Long): Unit = {
    val l = lo(k)
    val r = l + p
    val carry = ((l & p) | ((l | p) & ~r)) >>> 63
    hi(k) += (p >> 63) + carry
    lo(k) = r
  }

  private def merge128(aHi: Array[Long], aLo: Array[Long],
                       bHi: Array[Long], bLo: Array[Long]): Unit = {
    var k = 0
    while (k < aLo.length) {
      val l = aLo(k); val p = bLo(k)
      val r = l + p
      val carry = ((l & p) | ((l | p) & ~r)) >>> 63
      aHi(k) += bHi(k) + carry
      aLo(k) = r
      k += 1
    }
  }

  private def toBig(hi: Array[Long], lo: Array[Long]): Seq[String] =
    hi.indices.map { k =>
      ((BigInt(hi(k)) << 64) + (BigInt(lo(k)) & ExactMoments.LoMask)).toString
    }

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Result] = Encoders.product[Result]
}

object ExactMoments {
  private val LoMask = (BigInt(1) << 64) - 1
  case class Buf(dim: Int, count: Long, sHi: Array[Long], sLo: Array[Long],
                 gHi: Array[Long], gLo: Array[Long])
  /** n, dim (−1 ⇔ empty), Σx and the packed upper triangle of Σxxᵀ
    * (row-major, j ≥ i) as exact decimal strings. */
  case class Result(n: Long, dim: Int, sums: Seq[String], gram: Seq[String])
}
