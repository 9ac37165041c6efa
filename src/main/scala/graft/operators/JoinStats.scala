package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-key overlap profiling with theta set algebra — answer "what will
  * this join do?" before paying for it.
  *
  * At 100 TB, a bad join is discovered after an hours-long shuffle. One
  * sketch pass per side (map-side partial, KB exchange) yields distinct
  * counts, overlap, Jaccard, and per-side containment — enough to decide
  * between broadcast / shuffle / bloom-prune ([[BloomPrune]]), to detect
  * an accidental cross-join key, or to size AQE expectations. The two
  * one-row sketch aggregates cross-join for free.
  *
  * Each side's sketch is also reusable: persist it next to the table
  * (see [[SketchTable]]) and overlap questions against ANY other keyed
  * table become sketch-only, no data pass at all.
  */
object JoinStats {

  /** One row: approx distinct keys per side, overlap, union, Jaccard,
    * and containment fractions (overlap / each side). */
  def keyOverlap(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
                 lgK: Int = 12): DataFrame = {
    graft.Registration.register(a.sparkSession)
    val skA = a.agg(call_function("datasketch_theta", lit(lgK), col(aKey)).as("ska"))
    val skB = b.agg(call_function("datasketch_theta", lit(lgK), col(bKey)).as("skb"))
    skA.crossJoin(skB)
      .withColumn("inter", call_function("datasketch_theta_intersect", col("ska"), col("skb")))
      .withColumn("uni", call_function("datasketch_theta_union", col("ska"), col("skb")))
      .select(
        call_function("datasketch_theta_estimate", col("ska")).as("distinct_a"),
        call_function("datasketch_theta_estimate", col("skb")).as("distinct_b"),
        call_function("datasketch_theta_estimate", col("inter")).as("overlap"),
        call_function("datasketch_theta_estimate", col("uni")).as("union_keys"))
      // empty sides make the ratios 0/0 — NULL, not an ANSI divide error
      .withColumn("jaccard", try_divide(col("overlap"), col("union_keys")))
      .withColumn("containment_a", try_divide(col("overlap"), col("distinct_a")))
      .withColumn("containment_b", try_divide(col("overlap"), col("distinct_b")))
  }
}
