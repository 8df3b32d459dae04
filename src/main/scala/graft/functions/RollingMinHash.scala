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
}
