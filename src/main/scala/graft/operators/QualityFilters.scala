package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.storage.StorageLevel
import org.apache.spark.unsafe.types.UTF8String

/** Repetition-based quality filters — the Gopher/C4-style signals that
  * catch boilerplate, template spam, and stuck-generator text.
  *
  * Two tiers with very different scale shapes:
  *  - [[repetitionStats]] is INTRA-document: pure array expressions per
  *    row, no shuffle at all — it runs at scan speed over 100 TB and is
  *    the cheap first-pass filter.
  *  - [[sharedGramStats]] is CORPUS-level: an n-gram's document frequency
  *    needs one aggregation across all documents. Grams are hashed to
  *    64-bit before the shuffle (xxhash64, the q35/q36 no-collision
  *    regime), so the two exchanges carry (doc, gramHash) pairs — ~16 B
  *    per gram — never the gram text; the doc-frequency aggregation is
  *    map-side partial (a hot boilerplate gram combines within each task
  *    before shuffling one row per task).
  */
object QualityFilters {

  private def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Per-row repetition counters as a struct:
    * (tokens, dup_tokens, bigrams, dup_bigrams) where dup_* counts
    * occurrences beyond the first (so dup/total is the duplicated
    * fraction). Integer-valued by design: downstream aggregates stay
    * exactly oracle-comparable (no float-summation order sensitivity).
    * Native one-scan expression ([[RepetitionStats]]); the composed
    * [[repetitionStatsArrayOps]] is the parity-tested reference shape. */
  def repetitionStats(text: Column): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(RepetitionStats(GraftShims.expression(text)))
  }

  /** Array-ops formulation of [[repetitionStats]] — kept as the unit-test
    * oracle for the native expression (five array allocations per row vs
    * one byte scan). */
  def repetitionStatsArrayOps(text: Column): Column = {
    val toks = TextOps.tokens(text)
    val bi = ngrams(toks, 2)
    struct(
      size(toks).as("tokens"),
      (size(toks) - size(array_distinct(toks))).as("dup_tokens"),
      size(bi).as("bigrams"),
      (size(bi) - size(array_distinct(bi))).as("dup_bigrams"))
  }

  /** Corpus-level duplicated-n-gram profile: for each document, how many
    * of its DISTINCT token n-grams occur in at least `minDf` documents
    * (shared boilerplate). Output: (doc, grams, shared_grams).
    *
    * Gram identity rides the native [[ShingleSet]] fold (one byte scan
    * per doc emitting the distinct hashed n-gram set — the q35/q36
    * machinery and its no-collision regime) instead of materializing
    * string gram arrays; docs under n tokens are pre-filtered because the
    * shingle fold of a short doc would otherwise emit one pseudo-gram.
    * The gram table is generated ONCE (persisted at the most-derived
    * point, the jaccardPairs discipline) and consumed twice: a map-side-
    * partial doc-frequency aggregate, then the df join back. NOT a
    * count-over-window on the hash, although that would be one exchange
    * fewer: a boilerplate gram present in every document — the exact
    * signal this operator hunts — would concentrate a corpus-
    * proportional partition into a single window task, and AQE can split
    * a skewed shuffle-join partition but never a window partition. The
    * partial aggregate ships one row per (task, hot gram), and the join
    * skew is the class OptimizeSkewedJoin handles.
    *
    * Lifetime contract: the persisted gram table is NOT unpersisted here
    * — the result is lazy and consumes it twice, so any eager release
    * would either re-pay the shingle fold per branch or force
    * materialization at call time (breaking plan composition and the
    * PlanSpec exchange pin). Its blocks are freed by the ContextCleaner
    * once the profile DataFrame is unreferenced; callers running many
    * profiles in one long-lived session should `spark.catalog
    * .clearCache()` between them (the bench's inter-run sweep does
    * exactly this). */
  def sharedGramStats(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 5, minDf: Int = 2): DataFrame = {
    val grams = DedupOps.shingleSets(
        df.filter(TextOps.tokenCount(col(textCol)) >= n), idCol, textCol, n)
      .select(col("doc"), explode(col("shset")).as("gh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dfreq = grams.groupBy("gh").agg(count(lit(1)).as("df"))
    grams.join(dfreq, "gh")
      .groupBy("doc").agg(
        count(lit(1)).as("grams"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("shared_grams"))
  }

  /** The Gopher stopword probe set (Rae et al. 2021 §A1.1: a document
    * must contain ≥2 of these to count as running English prose). Exact
    * token match — the corpora this gate runs on are case-normalized
    * upstream, and an exact probe keeps the DuckDB oracle trivial. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Thresholds for the [[ruleReport]] heuristic gate. Defaults are the
    * published Gopher repetition/quality values (Rae et al. 2021 §A1.1)
    * and C4's page-level bans (Raffel et al. 2020 §2.2); every knob is a
    * plain number so a curation lane can re-tune per corpus. A
    * `minTermLines` of 0 disables the terminal-punctuation floor (single-
    * line corpora have no sentence structure to probe). */
  case class RuleParams(
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletLineRatio: Double = 0.9,
      maxEllipsisLineRatio: Double = 0.3,
      minAlphaWordRatio: Double = 0.8,
      minStopHits: Int = 2,
      maxDupLineRatio: Double = 0.3,
      minTermLines: Int = 1,
      banLoremIpsum: Boolean = true,
      banBrace: Boolean = true,
      // Gopher §A1.1 repetition tier (r19 session 2): OFF by default so
      // the 11-rule gate's committed oracles are invariant; thresholds
      // are the paper's published values when enabled.
      checkRepetition: Boolean = false,
      maxTop2GramCharRatio: Double = 0.20,
      maxTop3GramCharRatio: Double = 0.18,
      maxTop4GramCharRatio: Double = 0.16,
      maxDup5GramCharRatio: Double = 0.15,
      maxDup6GramCharRatio: Double = 0.14,
      maxDup7GramCharRatio: Double = 0.13,
      maxDup8GramCharRatio: Double = 0.12,
      maxDup9GramCharRatio: Double = 0.11,
      maxDup10GramCharRatio: Double = 0.10)

  /** One-pass per-row counters for the Gopher/C4 page-level rules, as a
    * struct of exact integers/booleans (the [[repetitionStats]]
    * discipline: rule verdicts and any downstream aggregate stay exactly
    * oracle-comparable):
    *
    *  - `n_tokens` / `n_chars` — whitespace tokens and their summed
    *    lengths (mean word length = n_chars/n_tokens),
    *  - `n_alpha_tokens` — tokens containing ≥1 ASCII letter,
    *  - `n_stop_hits` — DISTINCT [[GopherStopwords]] present,
    *  - `n_symbols` — '#' chars + '…' chars + non-overlapping "..."
    *    runs (Gopher's symbol-to-word ratio numerator),
    *  - `n_lines` — non-blank lines; `n_bullet_lines` (trimmed line
    *    starts '-'/'*'/'•'), `n_ellipsis_lines` (ends "..."/'…'),
    *    `n_term_lines` (ends '.'/'!'/'?'/'"'), `n_dup_lines`
    *    (occurrences beyond first of a trimmed line),
    *  - `has_lorem` ("lorem ipsum" case-folded), `has_brace` ('{').
    *
    * Native one-scan expression ([[RuleStats]] →
    * [[GraftRuntime.ruleStats]]): the composed built-in formulation
    * ([[ruleStatsArrayOps]], kept as the parity pin) evaluates ~10
    * higher-order array lambdas per row INTERPRETED — HOFs never enter
    * whole-stage codegen — which is real money on the gate's place in
    * the pipeline (the cheapest text stage, run over every raw doc). */
  def ruleStats(text: Column): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(RuleStats(GraftShims.expression(text)))
  }

  /** Built-in-composition formulation of [[ruleStats]] — the parity-test
    * reference for the native expression (NULL handling differs: the
    * native returns a null STRUCT on null text, this returns a struct of
    * nulls — callers gate on non-null corpora). */
  private[graft] def ruleStatsArrayOps(text: Column): Column = {
    val tk = TextOps.tokens(text)
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => length(l) > 0)
    def countChar(c: String): Column =
      length(text) - length(replace(text, lit(c), lit("")))
    struct(
      size(tk).as("n_tokens"),
      aggregate(tk, lit(0), (a, t) => a + length(t)).as("n_chars"),
      size(filter(tk, t => t.rlike("[A-Za-z]"))).as("n_alpha_tokens"),
      size(array_intersect(array_distinct(tk),
        array(GopherStopwords.map(lit): _*))).as("n_stop_hits"),
      (countChar("#") + countChar("…") +
        (length(text) - length(replace(text, lit("..."), lit("")))) / 3)
        .as("n_symbols"),
      size(lines).as("n_lines"),
      size(filter(lines, l => substring(l, 1, 1).isin("-", "*", "•")))
        .as("n_bullet_lines"),
      size(filter(lines, l => endswith(l, lit("...")) || endswith(l, lit("…"))))
        .as("n_ellipsis_lines"),
      size(filter(lines, l => substring(l, -1, 1).isin(".", "!", "?", "\"")))
        .as("n_term_lines"),
      (size(lines) - size(array_distinct(lines))).as("n_dup_lines"),
      lower(text).contains("lorem ipsum").as("has_lorem"),
      text.contains("{").as("has_brace"))
  }

  /** Per-rule verdicts over a [[ruleStats]] struct: true = the document
    * PASSES that rule. Ratio rules compare exact integer counters
    * against `threshold × denominator` in doubles — integer-to-double
    * conversion and one IEEE multiply/divide are bit-reproducible, so
    * the DuckDB oracle computes identical booleans. A zero denominator
    * passes its ratio rules (the empty case is `r_words`' job). */
  def ruleVerdicts(st: Column, p: RuleParams): Column = {
    val n = st.getField("n_tokens").cast("double")
    val nl = st.getField("n_lines").cast("double")
    struct(
      (st.getField("n_tokens") >= p.minWords &&
        st.getField("n_tokens") <= p.maxWords).as("r_words"),
      (st.getField("n_tokens") > 0 &&
        st.getField("n_chars") >= lit(p.minMeanWordLen) * n &&
        st.getField("n_chars") <= lit(p.maxMeanWordLen) * n).as("r_mean_len"),
      (st.getField("n_symbols") <= lit(p.maxSymbolRatio) * n).as("r_symbols"),
      (st.getField("n_bullet_lines") <= lit(p.maxBulletLineRatio) * nl)
        .as("r_bullets"),
      (st.getField("n_ellipsis_lines") <= lit(p.maxEllipsisLineRatio) * nl)
        .as("r_ellipsis"),
      (st.getField("n_alpha_tokens") >= lit(p.minAlphaWordRatio) * n)
        .as("r_alpha"),
      (st.getField("n_stop_hits") >= p.minStopHits).as("r_stopwords"),
      (st.getField("n_dup_lines") <= lit(p.maxDupLineRatio) * nl)
        .as("r_dup_lines"),
      (st.getField("n_term_lines") >= p.minTermLines).as("r_terminal"),
      (!(lit(p.banLoremIpsum) && st.getField("has_lorem"))).as("r_lorem"),
      (!(lit(p.banBrace) && st.getField("has_brace"))).as("r_brace"))
  }

  /** The document-level heuristic quality gate: every [[ruleVerdicts]]
    * rule as its own audit column plus `rule_pass` (their conjunction) —
    * the Gopher/C4 page-filter composition a 100 TB pipeline runs as its
    * cheapest text stage. Per-row scan work only: no shuffle, no model,
    * pushes down with the enclosing projection. */
  def ruleReport(df: DataFrame, idCol: String, textCol: String,
                 params: RuleParams = RuleParams()): DataFrame = {
    val st = ruleStats(col(textCol))
    val withStats = df.withColumn("__rst", st)
      .withColumn("__rep", repFractions(col(textCol)))
      .withColumn("__rv", ruleVerdicts(col("__rst"), params))
      .withColumn("__rpv", repVerdicts(col("__rep"), params))
    val ruleCols = Seq("r_words", "r_mean_len", "r_symbols", "r_bullets",
      "r_ellipsis", "r_alpha", "r_stopwords", "r_dup_lines", "r_terminal",
      "r_lorem", "r_brace")
    val fracCols = RepFractions.schema.fieldNames.toSeq
    val repCols = Seq("r_top2_chars", "r_top3_chars", "r_top4_chars") ++
      (5 to 10).map(n => s"r_dup${n}_chars")
    // the repetition columns are always REPORTED (the audit's value is
    // seeing every signal); they join the rule_pass conjunction only
    // when the params enable the tier — matching RuleGate exactly
    val pass = (ruleCols.map(r => col("__rv").getField(r)) ++
      (if (params.checkRepetition) repCols.map(r => col("__rpv").getField(r))
       else Nil)).reduce(_ && _)
    val out: Seq[Column] =
      df.columns.toSeq.map(col) ++
        Seq(col("__rst").getField("n_tokens").cast("long").as("n_tokens")) ++
        ruleCols.map(r => col("__rv").getField(r).as(r)) ++
        fracCols.map(f => col("__rep").getField(f).as(f)) ++
        repCols.map(r => col("__rpv").getField(r).as(r)) ++
        Seq(pass.as("rule_pass"))
    withStats.select(out: _*)
  }

  /** The gate verdict as ONE boolean expression ([[RuleGate]]): the
    * conjunction of [[ruleVerdicts]] computed INSIDE the native scan.
    *
    * Why not `ruleReport(...).filter(!col("rule_pass"))` on the pipeline
    * path: predicate pushdown rewrites the filter condition in terms of
    * the scan output, inlining `graft_rule_stats(text)` once per rule
    * conjunct — and `FilterExec` does no subexpression elimination, so
    * the byte scan would run up to ~20× per row (ProjectExec DOES
    * eliminate, which is why the report path is fine). A single-field
    * verdict keeps the filter to ONE evaluation per row, pushed all the
    * way to the scan. Parity with the composed conjunction is
    * spec-pinned; the threshold arithmetic is the same IEEE ops. */
  def rulePass(text: Column, params: RuleParams = RuleParams()): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(RuleGate(GraftShims.expression(text), params))
  }

  /** Gopher §A1.1 repetition fractions as a 9-double struct (native
    * [[RepFractions]] → [[GraftRuntime.repFractions]]): top n-gram
    * character fractions (n = 2..4, max-coverage tie-break — see the
    * runtime scaladoc for the documented deviation from the paper's
    * tie-ambiguous "most frequent") and duplicate n-gram character
    * fractions (n = 5..10, position-union coverage). Spec-pinned against
    * an independent Scala reference and the q162 SQL re-derivation. */
  def repFractions(text: Column): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(RepFractions(GraftShims.expression(text)))
  }

  /** Per-rule verdicts over a [[repFractions]] struct (true = passes);
    * the repetition twin of [[ruleVerdicts]]. */
  def repVerdicts(rep: Column, p: RuleParams): Column = struct(
    (rep.getField("top2_frac") <= p.maxTop2GramCharRatio).as("r_top2_chars"),
    (rep.getField("top3_frac") <= p.maxTop3GramCharRatio).as("r_top3_chars"),
    (rep.getField("top4_frac") <= p.maxTop4GramCharRatio).as("r_top4_chars"),
    (rep.getField("dup5_frac") <= p.maxDup5GramCharRatio).as("r_dup5_chars"),
    (rep.getField("dup6_frac") <= p.maxDup6GramCharRatio).as("r_dup6_chars"),
    (rep.getField("dup7_frac") <= p.maxDup7GramCharRatio).as("r_dup7_chars"),
    (rep.getField("dup8_frac") <= p.maxDup8GramCharRatio).as("r_dup8_chars"),
    (rep.getField("dup9_frac") <= p.maxDup9GramCharRatio).as("r_dup9_chars"),
    (rep.getField("dup10_frac") <= p.maxDup10GramCharRatio).as("r_dup10_chars"))

  /** [[repVerdicts]]' conjunction over a pre-computed fractions row —
    * shared by the [[RuleGate]] runtime. */
  private[operators] def repPasses(r: org.apache.spark.sql.catalyst.InternalRow,
                                   p: RuleParams): Boolean =
    r.getDouble(0) <= p.maxTop2GramCharRatio &&
      r.getDouble(1) <= p.maxTop3GramCharRatio &&
      r.getDouble(2) <= p.maxTop4GramCharRatio &&
      r.getDouble(3) <= p.maxDup5GramCharRatio &&
      r.getDouble(4) <= p.maxDup6GramCharRatio &&
      r.getDouble(5) <= p.maxDup7GramCharRatio &&
      r.getDouble(6) <= p.maxDup8GramCharRatio &&
      r.getDouble(7) <= p.maxDup9GramCharRatio &&
      r.getDouble(8) <= p.maxDup10GramCharRatio

  /** [[rulePass]]'s body over a pre-computed stats row — shared by the
    * expression runtime; arithmetic mirrors [[ruleVerdicts]] op for op
    * (int→double casts, threshold × denominator multiplies). */
  private[operators] def passes(r: org.apache.spark.sql.catalyst.InternalRow,
                                p: RuleParams): Boolean = {
    val nTokens = r.getInt(0)
    val n = nTokens.toDouble
    val nl = r.getInt(5).toDouble
    nTokens >= p.minWords && nTokens <= p.maxWords &&
      (nTokens > 0 && r.getInt(1).toDouble >= p.minMeanWordLen * n &&
        r.getInt(1).toDouble <= p.maxMeanWordLen * n) &&
      r.getDouble(4) <= p.maxSymbolRatio * n &&
      r.getInt(6).toDouble <= p.maxBulletLineRatio * nl &&
      r.getInt(7).toDouble <= p.maxEllipsisLineRatio * nl &&
      r.getInt(2).toDouble >= p.minAlphaWordRatio * n &&
      r.getInt(3) >= p.minStopHits &&
      r.getInt(9).toDouble <= p.maxDupLineRatio * nl &&
      r.getInt(8) >= p.minTermLines &&
      !(p.banLoremIpsum && r.getBoolean(10)) &&
      !(p.banBrace && r.getBoolean(11))
  }

  /** Index of `t` in [[GopherStopwords]], or -1 — the native scan tracks
    * DISTINCT hits as a bitmask. */
  private[operators] def gopherIndex(t: UTF8String): Int = {
    val boxed = gopherMap.get(t)
    if (boxed == null) -1 else boxed.intValue()
  }
  private val gopherMap: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](16)
    GopherStopwords.zipWithIndex.foreach { case (w, i) =>
      m.put(UTF8String.fromString(w), Integer.valueOf(i))
    }
    m
  }
}

/** Native one-scan Gopher/C4 rule counters — see
  * [[QualityFilters.ruleStats]]. */
case class RuleStats(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_rule_stats"
  override def dataType: DataType = RuleStats.schema
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rule_stats requires a string column, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(input: Any): Any =
    GraftRuntime.ruleStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.operators.GraftRuntime.ruleStats($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Native Gopher repetition fractions — see
  * [[QualityFilters.repFractions]]. */
case class RepFractions(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_rep_fractions"
  override def dataType: DataType = RepFractions.schema
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rep_fractions requires a string column, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(input: Any): Any =
    GraftRuntime.repFractions(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.operators.GraftRuntime.repFractions($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RepFractions {
  val schema: StructType = StructType(
    (Seq("top2_frac", "top3_frac", "top4_frac") ++
      (5 to 10).map(n => s"dup${n}_frac"))
      .map(StructField(_, DoubleType, nullable = false)))
}

/** Native single-boolean Gopher/C4 gate verdict — see
  * [[QualityFilters.rulePass]]. Thresholds ride into generated code via
  * `addReferenceObj` (the Bpe-encode pattern). */
case class RuleGate(child: Expression, params: QualityFilters.RuleParams)
    extends UnaryExpression {
  override def prettyName: String = "graft_rule_gate"
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rule_gate requires a string column, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(input: Any): Any =
    GraftRuntime.rulePass(input.asInstanceOf[UTF8String], params)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ruleParams", params,
      classOf[QualityFilters.RuleParams].getName)
    defineCodeGen(ctx, ev, a => s"graft.operators.GraftRuntime.rulePass($a, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RuleStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_alpha_tokens", IntegerType, nullable = false),
    StructField("n_stop_hits", IntegerType, nullable = false),
    StructField("n_symbols", DoubleType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_bullet_lines", IntegerType, nullable = false),
    StructField("n_ellipsis_lines", IntegerType, nullable = false),
    StructField("n_term_lines", IntegerType, nullable = false),
    StructField("n_dup_lines", IntegerType, nullable = false),
    StructField("has_lorem", BooleanType, nullable = false),
    StructField("has_brace", BooleanType, nullable = false)))
}
