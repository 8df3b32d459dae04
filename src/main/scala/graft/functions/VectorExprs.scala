package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

  /** Column entry point for [[QuantizedDot]]: Σ floor(x·1e6+0.5)·wᵢ
    * in one codegen'd pass, refusing null/NaN/|x| ≥ 10 loudly. */
  def quantized_dot(v: Column, weights: Seq[Double]): Column =
    ColumnBridge.column(QuantizedDot(ColumnBridge.expression(v), weights))

  /** Kernel behind [[QuantizedDot]] — the per-element guard matches
    * the Pca quantize contract verbatim. */
  def quantizedDot(a: ArrayData, w: Array[Double], floatIn: Boolean): Double = {
    val n = math.min(a.numElements(), w.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          "quantized_dot: coordinate is null, NaN, or >= 10 in " +
            "magnitude - breaks the 1e-6 fixed-point scatter contract: null")
      val x = if (floatIn) a.getFloat(i).toDouble else a.getDouble(i)
      if (!(math.abs(x) < 10.0))
        throw new IllegalArgumentException(
          "quantized_dot: coordinate is null, NaN, or >= 10 in " +
            "magnitude - breaks the 1e-6 fixed-point scatter contract: " + x)
      s += math.floor(x * 1e6 + 0.5) * w(i)
      i += 1
    }
    s
  }

  /** Column entry point for [[ProjectDots]]: the whole PCA/JL
    * projection of one vector in a single kernel call. */
  def project_dots(v: Column, mean: Seq[Double], comps: Seq[Seq[Double]],
                   scales: Seq[Double], scale: Int): Column =
    ColumnBridge.column(ProjectDots(ColumnBridge.expression(v),
      mean, comps, scales, scale))

  /** Kernel behind [[ProjectDots]] — replicates the composable
    * `zip_with(slice(v, 1, dim), mean, a−b)` → per-component
    * [[ArrayDot]] → `GateRound(s·scale, n)` chain op for op:
    * left-to-right double accumulation, a null coordinate reading
    * 0.0 after the subtraction (the ArrayData.getDouble null-slot
    * value the HOF chain produced), and Spark's BigDecimal HALF_UP
    * round with the NaN/Inf passthrough, `+ 0.0` sign-gated. */
  def projectDots(v: ArrayData, mean: Array[Double],
                  comps: Array[Array[Double]], scales: Array[Double],
                  scale: Int, floatIn: Boolean): ArrayData = {
    val dim = mean.length
    val c = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      c(i) =
        if (v.isNullAt(i)) 0.0
        else (if (floatIn) v.getFloat(i).toDouble else v.getDouble(i)) - mean(i)
      i += 1
    }
    val out = new Array[Double](comps.length)
    var j = 0
    while (j < comps.length) {
      val comp = comps(j)
      val n = math.min(dim, comp.length)
      var s = 0.0
      var k = 0
      while (k < n) { s += c(k) * comp(k); k += 1 }
      val x = s * scales(j)
      val r =
        if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
        else java.math.BigDecimal.valueOf(x)
          .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
      out(j) = r + 0.0
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Column entry point: all `tables` LSH sign-bit signatures of one
    * vector in a single kernel call (see [[LshSignatures]]). `planes`
    * is laid out `[table * bits + bit]`. */
  def lsh_signatures(v: Column, planes: Array[Array[Double]],
                     tables: Int, bits: Int): Column =
    ColumnBridge.column(
      LshSignatures(ColumnBridge.expression(v),
        planes.toSeq.map(_.toSeq), tables, bits))

  /** Kernel behind [[LshSignatures]]: per-bit dot products replicate
    * [[ArrayDot]]'s left-to-right double accumulation exactly (float
    * elements promoted per element), so the signed-projection oracle
    * replays bucket assignment bit-for-bit. */
  def lshSignatures(v: ArrayData, planes: Array[Array[Double]],
                    tables: Int, bits: Int, floatIn: Boolean): ArrayData = {
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var sig = 0
      var b = 0
      while (b < bits) {
        val p = planes(t * bits + b)
        val n = math.min(v.numElements(), p.length)
        var s = 0.0
        var i = 0
        if (floatIn) while (i < n) { s += v.getFloat(i).toDouble * p(i); i += 1 }
        else while (i < n) { s += v.getDouble(i) * p(i); i += 1 }
        if (s > 0) sig |= (1 << b)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/**
 * The whole PCA/JL projection of one vector in ONE codegen'd kernel
 * call — the fused form of [[graft.operators.Pca.project]]'s
 * composable chain (broadcast model crossJoin → `zip_with` centering
 * → `transform` of per-component [[ArrayDot]]s → `zip_with`
 * scale+[[GateRound]]), whose three higher-order functions were
 * interpreted per element and whose model rode a broadcast-joined
 * row. Here the model is ONE reference object (the [[LshSignatures]]
 * layout), the plan keeps no join, and the arithmetic replicates the
 * chain op for op (see [[ArrayDot.projectDots]]) — bit-identical
 * outputs, pinned in Round19OptSpec. `mean`/`comps`/`scales` are
 * Seqs for case-class VALUE equality (the CSE note on
 * [[LshSignatures]]).
 */
case class ProjectDots(child: Expression, mean: Seq[Double],
                       comps: Seq[Seq[Double]], scales: Seq[Double],
                       scale: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(comps.length == scales.length,
    s"need one scale per component, got ${comps.length} vs ${scales.length}")

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] =
    Seq(ColumnBridge.typeCollection(
      ArrayType(DoubleType), ArrayType(FloatType)))

  @transient private lazy val meanArr: Array[Double] = mean.toArray
  @transient private lazy val compsArr: Array[Array[Double]] =
    comps.map(_.toArray).toArray
  @transient private lazy val scalesArr: Array[Double] = scales.toArray

  private def floatIn: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ArrayDot.projectDots(v.asInstanceOf[ArrayData], meanArr, compsArr,
      scalesArr, scale, floatIn)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val meanRef = ctx.addReferenceObj("pdMean", meanArr, "double[]")
    val compsRef = ctx.addReferenceObj("pdComps", compsArr, "double[][]")
    val scalesRef = ctx.addReferenceObj("pdScales", scalesArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ArrayDot.projectDots($c, $meanRef, $compsRef, $scalesRef, $scale, $floatIn)")
  }

  override protected def withNewChildInternal(c: Expression): ProjectDots =
    copy(child = c)
  override def prettyName: String = "project_dots"
}

/**
 * All `tables` random-projection LSH signatures of a vector in ONE
 * codegen'd kernel call. The composable spelling — `array(table_0 …)`
 * where each table is a `bits`-step fold of `when(array_dot(v,
 * typedLit(plane)) > 0, 1) << b` — builds an expression tree of
 * tables × bits literal-array dot subtrees (e.g. 16 × 5 × 64-dim =
 * thousands of Catalyst nodes), which costs more in per-execution
 * analysis/optimization than the arithmetic itself. Here the planes
 * ride ONE reference object and the tree is ONE node; bucket
 * arithmetic is bit-identical (the [[ArrayDot]] accumulation order).
 *
 * `planes` is a Seq (not a raw Array) so the case class keeps VALUE
 * equality — semanticEquals / subexpression elimination can match two
 * separately constructed but identical instances; an Array field
 * would fall back to reference equality and silently defeat CSE.
 * Input must be array<float> or array<double>; other numeric element
 * types are implicitly cast to array<double> (the pre-kernel
 * behavior of the composed `ArrayDot` spelling), and a non-array
 * child fails analysis with a type-check error, never a cast crash.
 */
case class LshSignatures(child: Expression, planes: Seq[Seq[Double]],
                         tables: Int, bits: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(tables >= 1 && bits >= 1 && bits <= 30 &&
    planes.length == tables * bits,
    s"need tables*bits = ${tables * bits} planes, got ${planes.length}")

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] =
    // double FIRST: float/double arrays pass through uncast (both are
    // collection members), anything else implicitly casts to the
    // collection's first castable member — array<double>, matching
    // the pre-kernel `cast to array<double>` behavior exactly
    Seq(ColumnBridge.typeCollection(
      ArrayType(DoubleType), ArrayType(FloatType)))

  // the kernel's layout: one primitive double[][] reference object
  // shared by every row (built once per executor deserialization)
  @transient private lazy val planesArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  private def floatIn: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType,
    containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ArrayDot.lshSignatures(v.asInstanceOf[ArrayData], planesArr, tables, bits,
      floatIn)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planesArr, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ArrayDot.lshSignatures($c, $ref, $tables, $bits, $floatIn)")
  }

  override protected def withNewChildInternal(c: Expression): LshSignatures =
    copy(child = c)
  override def prettyName: String = "lsh_signatures"
}

/**
 * Fused 1e-6 quantize + dot against a broadcast weight vector — the
 * codegen'd form of `transform(v, x -> floor(x*1e6 + 0.5))` followed
 * by [[ArrayDot]] (the interpreted per-row HOF was
 * [[graft.operators.Pca.whitenExact]]'s only non-codegen step — the
 * r19 ADVICE item). Exactness contract unchanged: every quantized
 * coordinate is an integer-valued double ≤ 1e7, every product ≤
 * 1e12 and every partial sum ≤ 6.4e13 at dim 64 — far below 2⁵³, so
 * the double accumulation IS integer arithmetic and the value is
 * bit-identical to the HOF formulation. Null/NaN/|x| ≥ 10
 * coordinates are refused loudly (the eigenExact fixed-point guard,
 * thrown from the kernel with the same `fixed-point` message).
 */
case class QuantizedDot(child: Expression, weights: Seq[Double])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] =
    Seq(ColumnBridge.typeCollection(
      ArrayType(DoubleType), ArrayType(FloatType)))

  @transient private lazy val wArr: Array[Double] = weights.toArray

  private def floatIn: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any): Any =
    ArrayDot.quantizedDot(v.asInstanceOf[ArrayData], wArr, floatIn)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qdw", wArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ArrayDot.quantizedDot($c, $ref, $floatIn)")
  }

  override protected def withNewChildInternal(c: Expression): QuantizedDot =
    copy(child = c)
  override def prettyName: String = "quantized_dot"
}
