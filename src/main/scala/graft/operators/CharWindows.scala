package graft.operators

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sliding k-code-point window array: element `i` equals
  * `substr(s, i+1, k)`. The front of the char-n-gram operators
  * (trigram LM scoring, DSIR weighting).
  *
  * Why a custom expression: the composed formulation
  * `transform(sequence(1, length(t)-k+1), i => t.substr(i, k))` embeds
  * the WHOLE child expression `t` inside the lambda body, so an
  * interpreted lambda re-evaluates it per element — for a normalized
  * child (`lower(regexp_replace(trim(text)))`) that is one regex pass
  * per emitted window, O(len²) regex work per document. Here the child
  * evaluates once and windows are zero-copy slices of one byte array
  * ([[GraftRuntime.charWindows]], whole-stage codegen'd). */
case class CharWindows(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"window size must be >= 1, got $k")

  override def prettyName: String = "char_windows"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_windows requires a string column, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    GraftRuntime.charWindows(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.operators.GraftRuntime.charWindows($a, $k)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
