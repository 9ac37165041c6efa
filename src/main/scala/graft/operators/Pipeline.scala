package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the canonical training-data flow composed
  * from the engine's operators, one annotated DataFrame out:
  *
  *   1. exact dedup (md5 fingerprint; keep the lowest id per group),
  *   2. near dedup (MinHash+LSH candidates, exact-Jaccard verified; drop
  *      the higher id of every qualifying pair),
  *   3. quality floor ([[TextOps.qualityScore]]),
  *   4. language annotation ([[TextOps.langId]]).
  *
  * Every row is kept with a `decision` ∈ {kept, exact_dup, near_dup,
  * low_quality} rather than filtered away, so the curation run is
  * auditable and each reason's volume is one `GROUP BY` away. Shapes are
  * the scale-safe ones throughout: fingerprint window, banded LSH
  * equi-join, no text in any shuffle after tokenization.
  */
object Pipeline {

  /** @param knownNearDupPairs pre-mined verified near-dup pair evidence
    *        with (doc_a, doc_b) columns — the same corpus-snapshot memo
    *        lifecycle as `knownHot`: a production pipeline materializes
    *        the pair set when a snapshot is admitted, and every consumer
    *        (clustering, removal, curation) reads the persisted evidence
    *        instead of re-mining the corpus. Must come from the same
    *        (corpus, shingleK, nearDupThreshold) parameters; when None,
    *        the pairs are mined inline. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             nearDupThreshold: Double = 0.9, minQuality: Double = 0.2,
             shingleK: Int = 3, maxShingleDF: Int = 1000,
             knownHot: Option[Array[Long]] = None,
             knownNearDupPairs: Option[DataFrame] = None): DataFrame = {
    val id = col(idCol)

    // 1. exact-dup drop set: the ranking window sees only (fp, id) pairs,
    //    so full document rows never enter an exchange (the drop sets
    //    join back against the scan; AQE broadcasts them when small)
    val dropExact = DedupOps.dupIds(docs, idCol, textCol)
      .select(col("__dup_id").as("__exact_drop"))

    // 2. near-dup drop set: higher id of every verified pair (hot-shingle
    //    cap threaded through — boilerplate must not go quadratic here)
    val dropNear = knownNearDupPairs
      .getOrElse(DedupOps.minhashLshPairs(docs, idCol, textCol, shingleK, nearDupThreshold,
        maxShingleDF = maxShingleDF, knownHot = knownHot))
      .select(col("doc_b").as("__near_drop")).distinct()

    // NO forced broadcast on the drop sets: their size is O(duplicates),
    // which on a web-scale corpus can be 30–50% of the input — far past
    // any driver/executor broadcast budget. AQE broadcasts them at
    // runtime when they really are small; when they are not, the plain
    // shuffle join is the only plan that completes.
    docs
      .join(dropExact, id === col("__exact_drop"), "left")
      .join(dropNear, id === col("__near_drop"), "left")
      .withColumn("quality", TextOps.qualityScore(col(textCol)))
      .withColumn("lang", TextOps.langId(col(textCol)))
      .withColumn("decision",
        when(col("__exact_drop").isNotNull, "exact_dup")
          .when(col("__near_drop").isNotNull, "near_dup")
          .when(col("quality") < minQuality, "low_quality")
          .otherwise("kept"))
      .drop("__exact_drop", "__near_drop")
  }
}
