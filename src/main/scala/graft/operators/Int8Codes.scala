package graft.operators

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Pack a float vector into int8 codes (one byte per element) at the
  * given scale — the BINARY storage form of [[Quantize]]: exactly dim
  * bytes per vector instead of parquet-encoded INT32s, the layout a
  * 100 TB ANN index actually wants on disk and through the shuffle.
  * Static-call codegen per the [[DotProduct]] pattern. */
case class Int8Pack(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "graft_int8_pack"
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_int8_pack requires (array<float>, double), got ${l.simpleString}, ${r.simpleString}")
    }

  override protected def nullSafeEval(v: Any, s: Any): Any =
    GraftRuntime.int8Pack(v.asInstanceOf[ArrayData], s.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, s) => s"graft.operators.GraftRuntime.int8Pack($v, $s)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fused signed-byte dot product over two packed code columns — the
  * re-rank inner loop of the quantized ANN path. Quantization scales
  * cancel out of cosine (cos(s_a·a, s_b·b) = cos(a, b)), so ranking
  * needs only these integer dots. */
case class Int8Dot(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "graft_int8_dot"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_int8_dot requires two binary columns, got ${l.simpleString}, ${r.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftRuntime.int8Dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.operators.GraftRuntime.int8Dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
