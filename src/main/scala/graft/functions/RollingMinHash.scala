package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/**
 * Winnowing-style document fingerprint: the minimum of all Karp-Rabin
 * rolling hashes of `window`-byte substrings, computed in one O(n)
 * pass. Equal fingerprints are a strong signal of shared content
 * windows (the core of Stanford "winnowing" / MOSS-style dedup).
 *
 * A native Catalyst Expression (not a Scala UDF) so it participates in
 * whole-stage codegen: doGenCode emits the rolling loop directly into
 * the generated Java, no boxing / closure dispatch per row — this is
 * the hot path of a 100 TB dedup sweep.
 */
case class RollingMinHash(child: Expression, window: Int)
    extends UnaryExpression {

  private val B = 1000000007L // polynomial base
  // B^(window-1) with 64-bit wraparound, for the O(1) roll step
  private val BPOW: Long = {
    var p = 1L; var i = 0
    while (i < window - 1) { p *= B; i += 1 }
    p
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    RollingMinHash.minHash(bytes, window, B, BPOW)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingMinHash.minHash($c.getBytes(), $window, ${B}L, ${BPOW}L)")

  override protected def withNewChildInternal(c: Expression): RollingMinHash = copy(child = c)
  override def prettyName: String = "rolling_min_hash"
}

object RollingMinHash {
  /** O(n) Karp-Rabin scan; shared by interpreted eval and codegen. */
  def minHash(bytes: Array[Byte], window: Int, b: Long, bpow: Long): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    var h = 0L
    var i = 0
    while (i < w) { h = h * b + (bytes(i) & 0xFF); i += 1 }
    var min = h
    while (i < n) {
      h = (h - (bytes(i - w) & 0xFF) * bpow) * b + (bytes(i) & 0xFF)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Column-level entry point. */
  def rolling_min_hash(c: Column, window: Int = 16): Column =
    ColumnBridge.column(RollingMinHash(ColumnBridge.expression(c), window))

  /**
   * DuckDB oracle expression reproducing [[minHash]] EXACTLY: the
   * window hash Σ c_j·B^(w-1-j) is evaluated in HUGEINT with the
   * wraparound-power coefficients B^k mod 2^64 embedded as literals
   * (so 128-bit modular arithmetic reproduces Java's 64-bit long
   * overflow), reinterpreted as signed, and list_min'd over every
   * window start — O(n·w) per document instead of the kernel's O(n)
   * roll, which is fine at oracle scale. Valid for ASCII corpora
   * (ascii(char) = byte; the testdata is all-ASCII — a non-ASCII
   * corpus would surface as a verify mismatch, not silent error).
   *
   * `codes`/`n`/`w` name columns holding the per-char code list,
   * text length, and least(window, length).
   */
  def oracleExpr(window: Int, codes: String, n: String, w: String): String = {
    val M = java.math.BigInteger.ONE.shiftLeft(64)
    val b = java.math.BigInteger.valueOf(1000000007L)
    val pows = (1 to window)
      .map(k => b.modPow(java.math.BigInteger.valueOf(window.toLong - k), M))
    val p = pows.map(_.toString + "::HUGEINT").mkString("[", ",", "]")
    s"""CASE WHEN $n = 0 THEN 0 ELSE list_min(list_transform(
       list_transform(range(1, $n - $w + 2), i ->
         list_sum(list_transform(range(0, $w),
           j -> $codes[i + j] * ($p)[$window - $w + 1 + j]))
         % 18446744073709551616::HUGEINT),
       m -> (CASE WHEN m >= 9223372036854775808::HUGEINT
                  THEN m - 18446744073709551616::HUGEINT
                  ELSE m END)::BIGINT)) END"""
  }
}
