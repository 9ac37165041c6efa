package graft.operators

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native MinHash signature over a shingle-hash set.
  *
  * Result element i = min over shingles s of `xxhash64(s, i)`, with the
  * exact hash composition of the column form `xxhash64(col, lit(i))`
  * (seed 42 → fold the long, then fold the int) — pinned by a property
  * test against the composed `array_min(transform(...))` formulation,
  * which evaluates `numHashes` interpreted passes per row. One fused loop
  * in [[GraftRuntime.minhashSig]]. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig requires array<bigint>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    GraftRuntime.minhashSig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.operators.GraftRuntime.minhashSig($a, $numHashes)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
