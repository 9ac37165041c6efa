package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature over a shingle-hash set.
  *
  * Result element i = min over shingles s of `xxhash64(s, i)`, with the
  * exact hash composition of the column form `xxhash64(col, lit(i))`
  * (seed 42 → fold the long, then fold the int) — pinned by a property
  * test against the composed `array_min(transform(...))` formulation,
  * which evaluates `numHashes` interpreted passes per row. One fused loop
  * here; the fourth instance of the native-expression pattern. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

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

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = arr.getLong(j)
      // match xxhash64(s, lit(i)): seed 42 → fold long s → fold int i
      val base = XxHash64Function.hash(s, LongType, 42L)
      var i = 0
      while (i < numHashes) {
        val h = XxHash64Function.hash(i, IntegerType, base)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
