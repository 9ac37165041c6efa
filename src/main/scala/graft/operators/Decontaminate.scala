package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Test-set decontamination: flag corpus documents that share any k-gram
  * shingle with a benchmark/evaluation corpus, so training data can be
  * scrubbed of evaluation contamination.
  *
  * Shape at scale: candidate generation is an equi-join on the shingle
  * hash. The benchmark side is DISTINCT grams — bounded by the benchmark's
  * size (evaluation sets are MBs, not TBs), so AQE broadcasts it and the
  * corpus never shuffles on anything wider than (doc, gram-hash). Both
  * sides restrict to documents with ≥ k tokens (shorter documents have no
  * k-grams), which also keeps the degenerate short-text shingle fold out
  * of the match semantics.
  */
object Decontaminate {

  /** Distinct ids of corpus documents sharing ≥ 1 k-gram with the
    * benchmark. Output: (doc). */
  def contaminatedIds(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                      textCol: String, k: Int = 3): DataFrame = {
    def grams(df: DataFrame) = DedupOps.shingleSets(
        df.filter(TextOps.tokenCount(col(textCol)) >= k), idCol, textCol, k)
      .select(col("doc"), explode(col("shset")).as("g"))
    val benchGrams = grams(benchmark).select("g").distinct()
    // left-semi: the benchmark gram only gates existence, so no join
    // output is materialized and the hash probe short-circuits on first
    // match — same row set as inner-join + distinct by construction
    grams(corpus).join(benchGrams, Seq("g"), "left_semi")
      .select("doc").distinct()
  }

  /** Corpus with a `contaminated` flag column appended. */
  def flag(corpus: DataFrame, benchmark: DataFrame, idCol: String,
           textCol: String, k: Int = 3): DataFrame = {
    val bad = contaminatedIds(corpus, benchmark, idCol, textCol, k)
      .withColumn("__contam", lit(true))
    corpus.join(bad, corpus(idCol) === bad("doc"), "left")
      .withColumn("contaminated", coalesce(col("__contam"), lit(false)))
      .drop("doc", "__contam")
  }

  /** The full decontamination verdict — every grain the engine detects
    * at, one row per contaminated corpus document:
    *
    *   - `ngram_hit`: shares ≥ 1 k-gram shingle with the benchmark
    *     (membership — the cheapest, highest-recall grain);
    *   - `span_tokens`: total tokens across maximal verbatim runs of
    *     ≥ `minSpan` tokens shared with any benchmark document
    *     ([[SpanDedup.crossSpans]] — the sequence-extent grain;
    *     overlapping runs from different benchmark docs each count);
    *   - `sem_cosine`: max embedding cosine against the benchmark when
    *     ≥ `cosTau`, else NULL (the paraphrase grain that token grains
    *     cannot see), rounded to 6 places like the q44 convention.
    *
    * `n_grains` counts which fired; rows where none fired are omitted.
    *
    * Scale shape: the gram grains are the audited q59/q88 equi-join
    * plans. The semantic grain is an EXACT corpus × benchmark scan —
    * deliberately: an evaluation suite is a fixed, small relation (MBs
    * — the same boundedness contract [[contaminatedIds]] declares for
    * the gram side), so the nested-loop side is benchmark-bounded and
    * the corpus is scanned once, map-side, with hoisted norms. No
    * recall caveat, unlike the cell-bucketed ANN path — a
    * decontamination gate wants exactness, not speed. Callers with a
    * NON-small right side should use [[KMeansOps.incrementalSemDedup]]
    * machinery instead. */
  def report(corpus: DataFrame, benchmark: DataFrame,
             corpusEmb: DataFrame, benchmarkEmb: DataFrame,
             idCol: String = "doc_id", textCol: String = "text",
             vecIdCol: String = "vec_id", vecCol: String = "embedding",
             ngramK: Int = 3, spanK: Int = 8, minSpan: Int = 20,
             maxGramOccurrences: Int = 1000, cosTau: Double = 0.3): DataFrame = {
    val id = col(idCol)
    val ng = contaminatedIds(corpus, benchmark, idCol, textCol, ngramK)
      .select(col("doc").as("__ng_id"))
    val sp = SpanDedup.crossSpans(benchmark, corpus, idCol, textCol,
        spanK, minSpan, maxGramOccurrences)
      .groupBy(col("right_id").as("__sp_id"))
      .agg(sum("span_tokens").as("__sp_tokens"))
    val b = benchmarkEmb.select(col(vecCol).as("__bvec"),
      SimilarityOps.norm(col(vecCol)).as("__bnrm"))
    val sem = corpusEmb.select(col(vecIdCol).as("__sem_id"),
        col(vecCol).as("__cvec"), SimilarityOps.norm(col(vecCol)).as("__cnrm"))
      .crossJoin(b)
      .withColumn("__cos", SimilarityOps.dot(col("__cvec"), col("__bvec")) /
        (col("__cnrm") * col("__bnrm")))
      .groupBy("__sem_id").agg(max(col("__cos")).as("__mc"))
      .filter(col("__mc") >= cosTau)
    corpus.select(id)
      .join(ng, id === col("__ng_id"), "left")
      .join(sp, id === col("__sp_id"), "left")
      .join(sem, id === col("__sem_id"), "left")
      .withColumn("ngram_hit", col("__ng_id").isNotNull)
      .withColumn("span_tokens", coalesce(col("__sp_tokens"), lit(0L)))
      .withColumn("sem_cosine", round(col("__mc"), 6))
      .withColumn("n_grains",
        col("ngram_hit").cast("int") + (col("span_tokens") > 0L).cast("int") +
          col("__mc").isNotNull.cast("int"))
      .filter(col("n_grains") >= 1)
      .select(id, col("ngram_hit"), col("span_tokens"), col("sem_cosine"),
        col("n_grains"))
  }
}
