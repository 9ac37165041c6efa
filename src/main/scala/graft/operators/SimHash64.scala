package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * O(tokens·64) array writes. This one keeps the 64 counters in a local
  * array across one byte-scan of the string, no per-token allocation.
  * ~6× faster at sf0.1 and the difference grows with document length, so
  * it is the version a 100 TB dedup pass would run.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string column, got ${child.dataType.simpleString}")

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val votes = new Array[Int](64)
    var i = 0
    val n = bytes.length
    var any = false
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        any = true
        val h = XxHash64Function.hash(
          UTF8String.fromBytes(bytes, start, i - start), StringType, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
    }
    if (!any) 0L
    else {
      var sig = 0L
      var j = 0
      while (j < 64) {
        if (votes(j) > 0) sig |= (1L << j)
        j += 1
      }
      sig
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
