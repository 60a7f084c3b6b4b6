package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expressions for the embedding hot path — quantize,
  * exact dot product, exact squared L2 — registered through
  * [[graft.GraftExtensions]] like [[StemTokens]].
  *
  * The higher-order-function formulations in [[VectorFunctions]]
  * (`transform`/`zip_with`/`aggregate`) are semantically identical but
  * evaluate their lambda per element through the interpreted path
  * (HigherOrderFunction is CodegenFallback), boxing every element of
  * every 64-float vector on every comparison. These expressions run one
  * primitive `while` loop over the unsafe array data instead. Every ANN /
  * embedding-dedup query (q23/q24/q33/q40/q44/q56) sits on top of them;
  * the brute-force q23 at sf0.1 does 500 × 5 000 dots of dim 64 — ~2 ms
  * of multiply-adds that the interpreted form turns into ~10⁹ boxed
  * lambda calls.
  *
  * Interpreted eval and codegen share one kernel each (same discipline as
  * [[StemTokens]]); VectorExpressionsSpec pins them value-identical to
  * the HOF forms, including null-element and length-mismatch semantics
  * (`zip_with` pads the shorter side with null, so a length mismatch
  * yields a null sum — the kernels reproduce exactly that). */
object VectorKernels {

  /** floor(x * scale) per element, null elements pass through. */
  def quantize(arr: ArrayData, isFloat: Boolean, scale: Double): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        out(i) = java.lang.Long.valueOf(math.floor(x * scale).toLong)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Σ aᵢ·bᵢ over long arrays; null on length mismatch or null element
    * (the zip_with-pads-null semantics of [[VectorFunctions.dotExact]]). */
  def dotLongs(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** max |aᵢ| over a long array; null on null element, 0 when empty. */
  def maxAbsLongs(a: ArrayData): java.lang.Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = math.abs(a.getLong(i))
      if (v > acc) acc = v
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Symmetric int8 (127-level) scalar-quantization reconstruction
    * error, entirely in integer arithmetic: with s = max|aᵢ|, each
    * magnitude m quantizes to code m·127/s (truncating division — both
    * operands non-negative, so trunc ≡ floor in any engine) and
    * reconstructs as code·s/127; returns Σ (m − reconstructed)². An
    * all-zero vector returns 0; null on null element. Magnitudes must
    * stay below ~2⁵⁶/127 for the intermediate product — the 1e6-scaled
    * unit-norm embeddings are 10 orders of magnitude under that. */
  def sq8SqErrLongs(a: ArrayData): java.lang.Long = {
    val n = a.numElements()
    var i = 0
    var s = 0L
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = math.abs(a.getLong(i))
      if (v > s) s = v
      i += 1
    }
    if (s == 0L) return java.lang.Long.valueOf(0L)
    var acc = 0L
    i = 0
    while (i < n) {
      val m = math.abs(a.getLong(i))
      val code = m * 127L / s
      val rec = code * s / 127L
      val d = m - rec
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Element-wise aᵢ−bᵢ over long arrays (the IVF residual kernel:
    * vector − assigned centroid); null on length mismatch, null elements
    * propagate per position — the zip_with semantics. */
  def subLongs(a: ArrayData, b: ArrayData): ArrayData = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        out(i) = java.lang.Long.valueOf(a.getLong(i) - b.getLong(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Σ (aᵢ−bᵢ)² over long arrays; null semantics as [[dotLongs]]. */
  def sqdistLongs(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

/** `vec_quantize(arr, scale)`: float/double array → `floor(x*scale)` long
  * array (the engine-portable 1e-6 quantization of [[VectorFunctions]]). */
case class QuantizeVec(child: Expression, scale: Double)
    extends UnaryExpression {

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_quantize requires array<float> or array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, containsNull) => ArrayType(LongType, containsNull)
    case _ => ArrayType(LongType)
  }

  override def nullSafeEval(input: Any): Any =
    VectorKernels.quantize(input.asInstanceOf[ArrayData], isFloat, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels$$.MODULE$$.quantize($c, $isFloat, ${scale}D);")

  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)

  override def prettyName: String = "vec_quantize"
}

abstract class LongVectorFold extends BinaryExpression {
  /** Kernel invoked by both eval paths; returns null on length mismatch. */
  def kernel(a: ArrayData, b: ArrayData): java.lang.Long
  def kernelName: String

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = LongType
  // null even for non-null children: length mismatch / null element
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Long ${ev.value}_r =
      |  graft.functions.VectorKernels$$.MODULE$$.$kernelName($a, $b);
      |if (${ev.value}_r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ${ev.value}_r.longValue(); }
      |""".stripMargin)
}

abstract class LongVectorUnaryFold extends UnaryExpression {
  /** Kernel invoked by both eval paths; may return null. */
  def kernel(a: ArrayData): java.lang.Long
  def kernelName: String

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  // null even for a non-null child: a null element
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      |java.lang.Long ${ev.value}_r =
      |  graft.functions.VectorKernels$$.MODULE$$.$kernelName($a);
      |if (${ev.value}_r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ${ev.value}_r.longValue(); }
      |""".stripMargin)
}

/** `maxabs_longs(a)`: max absolute element of an int64 array. */
case class MaxAbsLongs(child: Expression) extends LongVectorUnaryFold {
  override def kernel(a: ArrayData): java.lang.Long =
    VectorKernels.maxAbsLongs(a)
  override def kernelName: String = "maxAbsLongs"
  override protected def withNewChildInternal(newChild: Expression): MaxAbsLongs =
    copy(child = newChild)
  override def prettyName: String = "maxabs_longs"
}

/** `sq8_sqerr_longs(a)`: exact int64 squared reconstruction error of
  * symmetric 127-level scalar quantization at the vector's own max-abs
  * scale. */
case class Sq8SqErrLongs(child: Expression) extends LongVectorUnaryFold {
  override def kernel(a: ArrayData): java.lang.Long =
    VectorKernels.sq8SqErrLongs(a)
  override def kernelName: String = "sq8SqErrLongs"
  override protected def withNewChildInternal(newChild: Expression): Sq8SqErrLongs =
    copy(child = newChild)
  override def prettyName: String = "sq8_sqerr_longs"
}

/** `dot_longs(a, b)`: exact int64 dot product. */
case class DotLongs(left: Expression, right: Expression) extends LongVectorFold {
  override def kernel(a: ArrayData, b: ArrayData): java.lang.Long =
    VectorKernels.dotLongs(a, b)
  override def kernelName: String = "dotLongs"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLongs =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_longs"
}

/** `sub_longs(a, b)`: element-wise int64 difference (array result) —
  * the residual computation `x − centroid(cell(x))` of residual IVF-PQ,
  * kept native so the corpus-wide residual projection stays inside
  * whole-stage codegen instead of an interpreted `zip_with` lambda. */
case class SubLongs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sub_longs requires two array<bigint>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  // null even for non-null children: a length mismatch
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.subLongs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
      |  graft.functions.VectorKernels$$.MODULE$$.subLongs($a, $b);
      |if (${ev.value}_r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ${ev.value}_r; }
      |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubLongs =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sub_longs"
}

/** `sqdist_longs(a, b)`: exact int64 squared L2 distance. */
case class SqDistLongs(left: Expression, right: Expression) extends LongVectorFold {
  override def kernel(a: ArrayData, b: ArrayData): java.lang.Long =
    VectorKernels.sqdistLongs(a, b)
  override def kernelName: String = "sqdistLongs"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistLongs =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sqdist_longs"
}
