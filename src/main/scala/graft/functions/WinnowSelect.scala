package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.graftbridge.ColumnBridge

/**
 * Winnowing window-min SELECTION kernel (Schleimer/Wilkerson/Aiken,
 * SIGMOD 2003): given the packed per-gram keys (h·2²⁰ + (2²⁰−1−pos)),
 * emit the distinct minima of every `w`-length sliding window — i.e.
 * the document's winnow fingerprint set — in ONE O(m) monotonic-deque
 * pass.
 *
 * This must be a native Expression, not a higher-order `transform`
 * over `slice`+`array_min`: a lambda referencing the key array
 * re-inlines the whole md5 gram-hash pipeline into the lambda body
 * after CollapseProject, making selection O(m²·hash) per document —
 * measured 78 s for the sf0.1 corpus vs ~2 s through this kernel.
 * Same lesson as the TokenGrams/spanDedup notes.
 *
 * Documents beyond the 2²⁰−1-gram id-packing cap fail LOUDLY here
 * (the packing would corrupt positions silently otherwise).
 */
case class WinnowSelect(child: Expression, window: Int)
    extends UnaryExpression {

  require(window >= 1, "winnow window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    WinnowSelect.select(v.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowSelect.select($c, $window)")

  override protected def withNewChildInternal(c: Expression): WinnowSelect =
    copy(child = c)
  override def prettyName: String = "winnow_select"
}

object WinnowSelect {
  val PosCap: Int = 1 << 20

  /** O(m) sliding-window minima (packed keys are unique, so no tie
    * handling is needed — the position packing already encodes the
    * rightmost-tie-break); distinct in first-occurrence order, exactly
    * like the `array_distinct`-over-windows formulation. */
  def select(keys: ArrayData, window: Int): ArrayData = {
    val m = keys.numElements()
    if (m >= PosCap)
      throw new IllegalStateException(
        s"winnow_select: document has $m grams, exceeding the 2^20-gram " +
          "id-packing cap — re-pack with wider position bits")
    if (m == 0) return new GenericArrayData(Array.empty[Long])
    val eff = math.min(window, m) // short doc: one whole-array window
    val dq = new Array[Int](m) // index deque, keys increasing
    var head = 0; var tail = 0
    val out = new java.util.ArrayList[java.lang.Long]()
    val seen = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i < m) {
      val kv = keys.getLong(i)
      while (tail > head && keys.getLong(dq(tail - 1)) >= kv) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - eff) head += 1
      if (i >= eff - 1) {
        val sel = keys.getLong(dq(head))
        if (seen.add(sel)) out.add(sel)
      }
      i += 1
    }
    val arr = new Array[Long](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  /** Column entry point: distinct winnow keys of a packed-key array. */
  def winnow_select(keys: Column, window: Int): Column =
    ColumnBridge.column(WinnowSelect(ColumnBridge.expression(keys), window))
}
