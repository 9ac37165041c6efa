package graft.operators

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over whitespace tokens.
  *
  * Semantics match the composed-array-ops version ([[DedupOps.simhash]]'s
  * spec): token hash = Spark `xxhash64` (seed 42) over the token's UTF-8
  * bytes; bit j of the result = sign of Σ_tokens (bit j set ? +1 : -1);
  * ties (vote 0) clear the bit; empty/blank input → 0.
  *
  * Why a custom expression: the composed version materializes a 64-long
  * vote array per token per row through `aggregate`/`zip_with` codegen —
  * O(tokens·64) array writes. [[GraftRuntime.simhash64]] keeps the 64
  * counters in a local array across one byte-scan of the string; ~6×
  * faster at sf0.1 and the difference grows with document length, so it
  * is the version a 100 TB dedup pass would run. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string column, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    GraftRuntime.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.operators.GraftRuntime.simhash64($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
