package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.graftbridge.ColumnBridge

/**
 * Native dot product over numeric array columns.
 *
 * Spark's composable route — `aggregate(zip_with(a, b, _*_), 0d, _+_)`
 * — is a higher-order function: interpreted per element, with a
 * zipped intermediate array allocated per row. For similarity search
 * that lambda overhead IS the workload (64 multiply-adds per pair,
 * millions of pairs), so this is one of the few places a custom
 * codegen'd Expression is genuinely warranted: a primitive loop,
 * no allocation, inlined into whole-stage codegen.
 */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    (elemType(left), elemType(right)) match {
      case (FloatType, FloatType) => ArrayDot.dotFF(a, b)
      case (FloatType, DoubleType) => ArrayDot.dotFD(a, b)
      case (DoubleType, FloatType) => ArrayDot.dotFD(b, a)
      case _ => ArrayDot.dotDD(a, b)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = (elemType(left), elemType(right)) match {
      case (FloatType, FloatType) => "dotFF"
      case (FloatType, DoubleType) => "dotFD"
      case (DoubleType, FloatType) => "dotDF"
      case _ => "dotDD"
    }
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ArrayDot.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "array_dot"
}

object ArrayDot {
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    s
  }
  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)
  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Column entry point: dot product of two numeric array columns. */
  def array_dot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
