package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-scan token statistics for the text-analysis operators.
  *
  * Emits `struct(n_tokens, n_chars, stop, en, es, de, fr)` where `stop`
  * counts [[TokenStats.stopwords]] hits and the language fields count the
  * per-language marker-word hits used by the language-ID heuristic.
  * Token semantics match `TextOps.tokens` (trim + ASCII-whitespace split).
  *
  * Why a custom expression: `langId`/`qualityScore` as column compositions
  * evaluate `split` + interpreted `filter` lambdas several times per row
  * (no common-subexpression elimination across when/greatest chains).
  * This is the third instance of the pattern (SimHash64, ShingleSet):
  * per-token inner loops belong in a native expression.
  */
case class TokenStats(child: Expression) extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_token_stats"
  override def dataType: DataType = TokenStats.schema
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_token_stats requires a string column, got ${child.dataType.simpleString}")

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
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

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TokenStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("stop", IntegerType, nullable = false),
    StructField("en", IntegerType, nullable = false),
    StructField("es", IntegerType, nullable = false),
    StructField("de", IntegerType, nullable = false),
    StructField("fr", IntegerType, nullable = false)))

  /** Must stay in sync with TextOps.stopwords / TextOps.langMarkers. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"))

  private def toSet(ws: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](ws.size * 2)
    ws.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  private[operators] val stopSet = toSet(stopwords)
  private[operators] val enSet = toSet(markers("en"))
  private[operators] val esSet = toSet(markers("es"))
  private[operators] val deSet = toSet(markers("de"))
  private[operators] val frSet = toSet(markers("fr"))
}
