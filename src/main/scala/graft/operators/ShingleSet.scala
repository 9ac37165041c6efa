package graft.operators

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct k-shingle hash set over whitespace tokens.
  *
  * Semantics match the composed-column formulation kept in
  * [[DedupOps.shingleSetsArrayOps]]: token hash = `xxhash64` (seed 42)
  * of the token bytes; shingle id = xor-rotate-5 fold of its k consecutive
  * token hashes; docs with fewer than k tokens produce the single fold of
  * all their tokens; result is the distinct set (first-occurrence order).
  *
  * Why a custom expression: the composed version nests three higher-order
  * functions (`transform(sequence, i => aggregate(slice(...)))`) which
  * evaluate interpreted with per-element boxing — ~1.1 ms/doc at sf0.1.
  * [[GraftRuntime.shingleSet]] is a single byte-scan plus an
  * insertion-ordered dedup table, ~20× faster, and the shingle step is
  * the front of every dedup pipeline the engine runs at 100 TB. */
case class ShingleSet(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def prettyName: String = "shingle_set"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingle_set requires a string column, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    GraftRuntime.shingleSet(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.operators.GraftRuntime.shingleSet($a, $k)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
