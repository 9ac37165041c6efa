package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the 100 TB join shape.
  *
  * A selective dimension (say, suppliers from one nation) joined to a huge
  * fact table still shuffles EVERY fact row under a plain shuffle join;
  * the rows that cannot match are discarded only after the network pays
  * for them. Building a bloom filter over the dimension's join keys (KBs–
  * MBs, one aggregate), broadcasting that single-row BLOB, and filtering
  * the fact side with `datasketch_bloom_might_contain` BEFORE the join
  * removes the non-matching traffic at the scan. Because bloom filters
  * have no false negatives, the subsequent exact join returns exactly the
  * unpruned result — false positives only cost a little residual shuffle.
  *
  * This is the same idea as Spark's internal runtime row-level filtering,
  * but as a first-class, storable sketch: the filter can be computed once,
  * persisted next to the dimension table, and reused across queries/days —
  * something the planner-internal variant cannot do.
  */
object BloomPrune {

  /** Fact rows that *might* join `dim` on `factKey == dimKey` — the
    * pre-shuffle prune. Superset of the true semi-join by at most fpp. */
  def bloomFilterFact(fact: DataFrame, factKey: String,
                      dim: DataFrame, dimKey: String,
                      maxDistinct: Long = 1 << 20,
                      fpp: Double = 0.01): DataFrame = {
    val blob = dim.agg(
      call_function("datasketch_bloom", lit(maxDistinct), lit(fpp), col(dimKey)).as("f"))
    // One-row build side broadcast to every fact partition; the probe is a
    // codegen'd static call, so the scan filter stays whole-stage.
    fact.join(broadcast(blob),
        call_function("datasketch_bloom_might_contain", col("f"), col(factKey)))
      .drop("f")
  }

  /** Exact inner join with the bloom prune planted in front of the fact
    * shuffle. Result ≡ `fact.join(dim, on)`; at scale the fact-side
    * exchange carries ~selectivity·|fact| rows instead of |fact|. */
  def bloomPrunedJoin(fact: DataFrame, factKey: String,
                      dim: DataFrame, dimKey: String,
                      maxDistinct: Long = 1 << 20,
                      fpp: Double = 0.01): DataFrame =
    bloomFilterFact(fact, factKey, dim, dimKey, maxDistinct, fpp)
      .join(dim, col(factKey) === dim(dimKey))
}
