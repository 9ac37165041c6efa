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

  /** One-scan token statistics (native [[TokenStats]] expression); the
    * shared input for tokenCount/stopwordRatio/qualityScore/langId so a
    * row is tokenized once, not once per metric. */
  def tokenStats(text: Column): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(TokenStats(GraftShims.expression(text)))
  }

  /** Token count (whitespace tokenizer). */
  def tokenCount(text: Column): Column = tokenStats(text).getField("n_tokens")

  /** BPE-ish subword count: word-piece regex splits on word boundaries and
    * digit runs; a cheap proxy for tokenizer cost estimation at corpus
    * scale. */
  def subwordCount(text: Column): Column =
    size(filter(split(lower(text), "[^a-z0-9]+|(?<=[a-z])(?=[0-9])"), t => length(t) > 0))

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val st = tokenStats(text)
    val n = st.getField("n_tokens").cast("double")
    when(n === 0, lit(0.0)).otherwise(st.getField("stop").cast("double") / n)
  }

  /** Deterministic quality score in [0,1]:
    * 0.6·min(1, tokens/256) + 0.2·stopword-ratio + 0.2·mean-token-length/8.
    * The formula is intentionally SQL-expressible so an exact oracle exists.
    */
  def qualityScore(text: Column): Column = {
    val st = tokenStats(text)
    val n = st.getField("n_tokens").cast("double")
    val lenScore = least(lit(1.0), n / lit(256.0))
    val stopRatio = when(n === 0, lit(0.0))
      .otherwise(st.getField("stop").cast("double") / n)
    val meanTokLen =
      when(n === 0, lit(0.0)).otherwise(st.getField("n_chars").cast("double") / n)
    lit(0.6) * lenScore + lit(0.2) * stopRatio +
      lit(0.2) * least(lit(1.0), meanTokLen / lit(8.0))
  }

  /** Language-ID: argmax of per-language marker-word hits (markers in
    * [[TokenStats.markers]]); 'und' when nothing hits; ties break toward
    * earlier languages (en > es > de > fr). Deterministic and tiny by
    * design; real pipelines would swap in a trained model — the operator
    * shape (scored argmax over token-set overlaps in one scan) is the
    * point. */
  def langId(text: Column): Column = {
    val st = tokenStats(text)
    val (en, es, de, fr) = (st.getField("en"), st.getField("es"),
      st.getField("de"), st.getField("fr"))
    when(greatest(en, es, de, fr) === 0, lit("und"))
      .when(fr > greatest(en, es, de), lit("fr"))
      .when(de > greatest(en, es), lit("de"))
      .when(es > en, lit("es"))
      .otherwise(lit("en"))
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
