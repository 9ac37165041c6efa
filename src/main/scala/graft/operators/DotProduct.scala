package graft.operators

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native double-precision dot product of two float vectors.
  *
  * Bit-identical to the composed
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)), 0.0, _ + _)`
  * (same left-to-right fold order, so oracle-compared cosines don't move),
  * but one fused loop instead of two interpreted higher-order passes —
  * the pair loop of brute-force similarity search runs this millions of
  * times. Generates a static call ([[GraftRuntime.dot]]) so whole-stage
  * codegen spans stay unbroken. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "graft_dot"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_dot requires two array<float> columns, got ${l.simpleString}, ${r.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftRuntime.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.operators.GraftRuntime.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
