package graft.operators

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared shape of the native word-gram expressions: tokenize once,
  * emit single-space-re-joined token groups. The composed formulations
  * (`transform(sequence(...), i => array_join(slice(split(...), ...)))`)
  * embed the split inside the lambda, so interpreted evaluation re-splits
  * the text once per emitted gram — O(len²/k) per document. These
  * evaluate the child once and copy token bytes out of one array
  * (whole-stage codegen'd via [[GraftRuntime]]). */
sealed trait WordGramExpr extends UnaryExpression {
  def k: Int
  require(k >= 1, s"gram size must be >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.simpleString}")
}

/** Non-overlapping k-token chunks (trailing partial chunk included;
  * blank input → empty array) — the unit of paragraph-style dedup on
  * corpora without newline structure ([[ParagraphDedup]]). */
case class WordChunks(child: Expression, k: Int) extends WordGramExpr {
  override def prettyName: String = "word_chunks"
  override protected def nullSafeEval(input: Any): Any =
    GraftRuntime.wordChunks(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.operators.GraftRuntime.wordChunks($a, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Sliding k-token windows (full windows only; fewer than k tokens →
  * empty array) — textual n-grams for boilerplate profiling (q67). */
case class WordWindows(child: Expression, k: Int) extends WordGramExpr {
  override def prettyName: String = "word_windows"
  override protected def nullSafeEval(input: Any): Any =
    GraftRuntime.wordWindows(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.operators.GraftRuntime.wordWindows($a, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass (term, tf) run-length pairs over the LOWERCASED whitespace
  * tokens of a document, sorted by term — the per-document input of
  * TF-IDF, token entropy, and any bag-of-words statistic ([[TfIdf]]).
  * The composed formulation inlines `sort_array(tokens)` into its run
  * -boundary lambda, re-sorting the array once per element comparison;
  * this evaluates the child once (lowercase → tokenize → sort → scan,
  * O(n log n) per document). Blank input → empty array. */
case class TermRuns(child: Expression) extends UnaryExpression {
  override def prettyName: String = "term_runs"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(input: Any): Any =
    GraftRuntime.termRuns(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.operators.GraftRuntime.termRuns($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
