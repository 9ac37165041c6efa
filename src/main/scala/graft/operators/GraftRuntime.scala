package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared runtime bodies for the native expressions — called both from
  * interpreted `nullSafeEval` and from generated code (each expression's
  * `doGenCode` emits a static call here, so whole-stage codegen spans stay
  * unbroken instead of falling back to interpreted expression bridges). */
object GraftRuntime {

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  @inline private def rot5(a: Long): Long = (a << 5) | (a >>> 59)

  // ---- DotProduct ---------------------------------------------------------

  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  // ---- SimHash64 ----------------------------------------------------------

  def simhash64(s: UTF8String): Long = {
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

  // ---- ShingleSet ---------------------------------------------------------

  def shingleSet(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
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

  // ---- MinHashSig ---------------------------------------------------------

  def minhashSig(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val base = XxHash64Function.hash(arr.getLong(j), LongType, 42L)
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

  // ---- TokenStats ---------------------------------------------------------

  def tokenStats(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    var nTokens, nChars, stop, en, es, de, fr = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        nTokens += 1
        nChars += i - start
        val t = UTF8String.fromBytes(bytes, start, i - start)
        if (TokenStats.stopSet.contains(t)) stop += 1
        if (TokenStats.enSet.contains(t)) en += 1
        if (TokenStats.esSet.contains(t)) es += 1
        if (TokenStats.deSet.contains(t)) de += 1
        if (TokenStats.frSet.contains(t)) fr += 1
      }
    }
    InternalRow(nTokens, nChars, stop, en, es, de, fr)
  }

  // ---- RepetitionStats ----------------------------------------------------

  private val Space = UTF8String.fromString(" ")

  /** One byte-scan repetition counters: (tokens, dup_tokens, bigrams,
    * dup_bigrams), dup_* = occurrences beyond the first. Exact set
    * semantics (UTF8String equality — no hashing shortcut), matching the
    * composed `array_distinct` formulation token-for-token; bigram
    * identity is the space-joined pair, identical to `concat_ws(" ", ...)`
    * (tokens cannot contain whitespace, so the join is injective). */
  def repetitionStats(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    var nTokens, nBigrams = 0
    val seenTok = new java.util.HashSet[UTF8String]()
    val seenBi = new java.util.HashSet[UTF8String]()
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        val t = UTF8String.fromBytes(bytes, start, i - start)
        nTokens += 1
        seenTok.add(t)
        if (prev != null) {
          nBigrams += 1
          seenBi.add(UTF8String.concat(prev, Space, t))
        }
        prev = t
      }
    }
    InternalRow(nTokens, nTokens - seenTok.size, nBigrams, nBigrams - seenBi.size)
  }
}
