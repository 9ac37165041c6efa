package graft.operators

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native positional k-gram hash array over whitespace tokens.
  *
  * Same gram identity as [[ShingleSet]] (xxhash64 seed-42 token hashes,
  * xor-rotate-5 fold of k consecutive ones) but kept in position order
  * with no dedup: element `p` identifies the gram starting at token `p`.
  * Documents with fewer than k tokens yield an empty array.
  *
  * This is the map-side front of the duplicated-span detector
  * ([[SpanDedup]]): one byte-scan per document, whole-stage codegen'd via
  * [[GraftRuntime.gramHashes]], so the only thing that ever leaves the
  * document scan is (doc, position, 8-byte gram id). The composed
  * higher-order-function formulation (`transform(sequence,
  * i => aggregate(slice(...)))`, kept in
  * [[SpanDedup.gramHashesArrayOps]]) evaluates interpreted with
  * per-element boxing — same ~20× penalty measured for ShingleSet. */
case class GramHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"gram size must be >= 1, got $k")

  override def prettyName: String = "gram_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gram_hashes requires a string column, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    GraftRuntime.gramHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.operators.GraftRuntime.gramHashes($a, $k)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
