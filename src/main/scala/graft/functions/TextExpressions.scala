package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native token-array predicate counting — the codegen replacement for
  * the `size(filter(tokens, x => x.rlike(pat)))` HOF pattern
  * (gopherRules' alpha-word rule and any per-token regex fraction).
  * HigherOrderFunction is CodegenFallback: the HOF form boxes every
  * token through an interpreted lambda AND recompiles nothing — each
  * `rlike` inside a lambda re-matches via its own machinery per row.
  * Here the Pattern compiles ONCE at plan time and one primitive loop
  * walks the unsafe array. Interpreted eval and codegen share the
  * kernel (the [[StemTokens]]/[[VectorKernels]] discipline).
  */
object TextKernels {
  /** # elements where `p.find()` matches (unanchored — `rlike`
    * semantics); null elements count as non-matches, exactly as a
    * null-returning filter lambda excludes its row. */
  def countRlike(arr: ArrayData, p: Pattern): Long = {
    val n = arr.numElements()
    var cnt = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) &&
          p.matcher(arr.getUTF8String(i).toString).find()) cnt += 1
      i += 1
    }
    cnt
  }

  /** Unicode NFC; the common already-normalized case short-circuits
    * without re-encoding. */
  def nfc(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(str)`: Unicode NFC normalization via
  * `java.text.Normalizer` — named after DuckDB's built-in of the same
  * name so oracle SQL reads identically. Spark has no built-in
  * normalization; the HOF-free unary expression keeps it inside
  * whole-stage codegen. Canonically-equivalent byte sequences (é vs
  * e + U+0301) normalize to one form — the precondition for
  * canonical text dedup over real-world corpora. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextKernels.nfc(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels$$.MODULE$$.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

/** `count_rlike(arr, 'pattern')`: # array elements matching the regex
  * literal (unanchored, Java regex — stay inside the Java/RE2-common
  * subset when the count feeds a hashed output). */
case class CountRlike(child: Expression, pattern: String)
    extends UnaryExpression {

  @transient private lazy val compiled: Pattern = Pattern.compile(pattern)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_rlike requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextKernels.countRlike(input.asInstanceOf[ArrayData], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("countRlikePattern", compiled,
      classOf[Pattern].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels$$.MODULE$$.countRlike($c, $patRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountRlike =
    copy(child = newChild)

  override def prettyName: String = "count_rlike"
}
