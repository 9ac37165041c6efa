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
}
