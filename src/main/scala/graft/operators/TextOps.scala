package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All of these are pure `Column` compositions over Spark built-ins — they
  * stay inside whole-stage codegen, push down through scans, and need no
  * UDFs, so they run at full Tungsten speed on a 1000-executor cluster.
  */
object TextOps {

  /** Whitespace tokenization; empty/blank text → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Token count (whitespace tokenizer). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word-piece regex splits on word boundaries and
    * digit runs; a cheap proxy for tokenizer cost estimation at corpus
    * scale. */
  def subwordCount(text: Column): Column =
    size(filter(split(lower(text), "[^a-z0-9]+|(?<=[a-z])(?=[0-9])"), t => length(t) > 0))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        size(filter(toks, t => t.isin(stopwords.map(s => lit(s)): _*))).cast("double") /
          size(toks).cast("double"))
  }

  /** Deterministic quality score in [0,1]:
    * 0.6·min(1, tokens/256) + 0.2·stopword-ratio + 0.2·mean-token-length/8.
    * The formula is intentionally SQL-expressible so an exact oracle exists.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val lenScore = least(lit(1.0), n / lit(256.0))
    val meanTokLen =
      when(n === 0, lit(0.0))
        .otherwise(length(regexp_replace(trim(text), "\\s+", "")).cast("double") / n)
    lit(0.6) * lenScore + lit(0.2) * stopwordRatio(text) +
      lit(0.2) * least(lit(1.0), meanTokLen / lit(8.0))
  }

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic. Deterministic and tiny by design; real pipelines would
    * swap in a trained model — the *operator shape* (scored argmax over
    * per-language token-set overlaps, fully codegen'd) is the point. */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"))

  /** Language-ID: argmax of marker-word hits; 'und' when no marker hits. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isin(markers.map(m => lit(m)): _*)))
    }
    // argmax with deterministic tie-break on language order
    val best = scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
          greatest(score, bestScore))
    }
    when(best._2 === 0, lit("und")).otherwise(best._1)
  }

  /** Canonical document fingerprint: md5 of lowercased,
    * whitespace-collapsed text. Used for exact dedup at corpus scale —
    * grouping on a 128-bit digest instead of the full text keeps shuffle
    * rows small at 100 TB. */
  def fingerprint(text: Column): Column =
    md5(encode(lower(regexp_replace(trim(text), "\\s+", " ")), "UTF-8"))

  /** 64-bit rolling content hash over tokens:
    * h ← rotl(h, 5) XOR xxhash64(t_i). Order-sensitive (unlike the md5
    * fingerprint, permuted docs differ) and overflow-free under ANSI mode
    * (a polynomial mod-2^64 hash would trip ANSI's multiply check).
    * Built from `aggregate` over the token array — still codegen'd. */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) =>
      shiftleft(acc, 5).bitwiseOR(shiftrightunsigned(acc, 59)).bitwiseXOR(xxhash64(t)))
}
