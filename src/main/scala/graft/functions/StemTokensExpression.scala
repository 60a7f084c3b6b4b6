package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Porter-stemming a token array — the
  * (b)-level extension mechanism (custom `Expression` with `doGenCode`,
  * registered through `SparkSessionExtensions` in
  * [[graft.GraftExtensions]]) where a Scala UDF would force a
  * serialization boundary: the UDF path converts ArrayData →
  * Seq[String] → ArrayData around every call and splits whole-stage
  * codegen at the projection; this expression works on ArrayData /
  * UTF8String in place and inlines into the generated code.
  *
  * Interpreted eval and codegen share one kernel
  * ([[StemTokens.evalArray]]), so both paths are value-identical by
  * construction; StemTokensSpec additionally pins them against the UDF
  * formulation. */
case class StemTokens(child: Expression) extends UnaryExpression {

  // AbstractDataType (the ExpectsInputTypes route) is private[sql]:
  // check the input type directly instead
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"stem_tokens requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, containsNull) => ArrayType(StringType, containsNull)
    case _ => ArrayType(StringType)
  }

  override def nullSafeEval(input: Any): Any =
    StemTokens.evalArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StemTokens$$.MODULE$$.evalArray($c);")

  override protected def withNewChildInternal(newChild: Expression): StemTokens =
    copy(child = newChild)

  override def prettyName: String = "stem_tokens"
}

object StemTokens {
  /** Shared kernel for interpreted eval and generated code. */
  def evalArray(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        out(i) = UTF8String.fromString(
          PorterStemmer.stem(arr.getUTF8String(i).toString))
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
