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

  /** Build the dimension-key filter and return its BLOB (one tiny job —
    * the analog of the sampling pass `repartitionByRange` runs, except the
    * result is a storable, mergeable value you can persist and reuse). */
  def buildFilter(dim: DataFrame, dimKey: String,
                  maxDistinct: Long, fpp: Double): Array[Byte] =
    dim.agg(call_function("datasketch_bloom",
        lit(maxDistinct), lit(fpp), col(dimKey)).as("f"))
      .head().getAs[Array[Byte]](0)

  /** Fact rows that *might* join `dim` on `factKey == dimKey` — the
    * pre-shuffle prune. Superset of the true semi-join by at most fpp.
    *
    * The filter BLOB is materialized eagerly (one job over the dim side)
    * and embedded as a literal, NOT carried through a one-row broadcast
    * join: a join would re-read the blob column per fact row, and
    * `UnsafeRow.getBinary` copies — ~80 KB × every fact row of pure
    * memcpy. As a literal the probe sees the same array instance each
    * row (the wrap memo hits by reference) and the predicate is an
    * ordinary scan filter inside whole-stage codegen. */
  def bloomFilterFact(fact: DataFrame, factKey: String,
                      dim: DataFrame, dimKey: String,
                      maxDistinct: Long = 1 << 20,
                      fpp: Double = 0.01): DataFrame = {
    val blob = buildFilter(dim, dimKey, maxDistinct, fpp)
    fact.filter(call_function("datasketch_bloom_might_contain", lit(blob), col(factKey)))
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
