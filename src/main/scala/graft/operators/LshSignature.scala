package graft.operators

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native random-hyperplane LSH signature of a float vector.
  *
  * Bit-identical (property-pinned) to the composed formulation — `planes`
  * separate `zip_with`/`aggregate` folds, each re-deriving every hyperplane
  * component through an interpreted `xxhash64` lambda per element — but one
  * fused loop over a plane matrix memoized per executor
  * ([[GraftRuntime.lshSignature]]). This was the last interpreted
  * higher-order-function hot path: every ANN probe and LSH near-dup pass
  * pays planes × dim of it per corpus row. Generates a static call so
  * whole-stage codegen spans stay unbroken. */
case class LshSignature(child: Expression, planes: Int) extends UnaryExpression {

  require(planes >= 1 && planes <= 63,
    s"planes must be in [1, 63] (sign bits packed into one long), got $planes")

  override def prettyName: String = "lsh_signature"
  override def dataType: DataType = LongType

  /** `containsNull` arrays are accepted on purpose — parquet list columns
    * read back with nullable elements even when no null exists. DEFINED
    * null-element semantics: a null component contributes 0.0 to every
    * plane projection (the vector is treated as sparse), pinned by the
    * null-element property test. This intentionally diverges from what a
    * naive composed `when(proj > 0, ...)` would do (null poisons the
    * whole projection → bit always 0): zeroing one missing component
    * keeps the other dims' geometry; collapsing the whole plane to bit 0
    * buckets every null-containing vector together. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_signature requires array<float>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    GraftRuntime.lshSignature(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.operators.GraftRuntime.lshSignature($a, $planes)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
