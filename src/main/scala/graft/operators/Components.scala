package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a near-duplicate pair set — the step that
  * turns pairwise dup evidence (exact / MinHash / SimHash / Jaccard /
  * cosine pairs) into disjoint clusters so the pipeline can keep exactly
  * one canonical document per cluster. Pairwise evidence alone cannot do
  * this: near-dup similarity is not transitive (A~B, B~C, A!~C chains are
  * routine in crawl data), so "drop the second element of every pair"
  * both over-drops and under-drops.
  *
  * Algorithm: iterative min-label propagation on the symmetrized edge
  * set. Each round is one equi-join (labels onto edge endpoints) + one
  * min-aggregation — both shuffle only (id, label) pairs, never text.
  * Convergence is detected with an order-independent hash signature of
  * the label table (a single scalar aggregate per round, no driver-side
  * data pull), and rounds are bounded by the label-graph diameter. For
  * dedup graphs the diameter is tiny (clusters are near-cliques produced
  * by banding, so 2–4 rounds closes them); `maxIter` guards the
  * adversarial long-chain case (non-convergence at `maxIter` is logged —
  * partially-propagated labels would otherwise silently split clusters).
  * Each round's result is persisted and the previous round unpersisted,
  * so RECOMPUTATION is bounded to one round — the logical plan still
  * grows linearly with round count (Catalyst re-analyzes the full
  * lineage each round), which is harmless at maxIter=30; true O(1)
  * lineage would need checkpointing, which dedup diameters never earn.
  * The returned labels are eagerly local-checkpointed so all
  * intermediate cached rounds can be freed before returning (no cache
  * leak into the session); the trade-off is that losing an executor
  * after return re-fails the job instead of recomputing — acceptable
  * for a bounded (id, label) table that the caller consumes promptly.
  * (For graphs with genuinely large diameter the published
  * alternating large-star/small-star scheme converges in O(log^2 n)
  * rounds; dedup graphs never need it, so we keep the simpler loop whose
  * per-round plan Catalyst fully optimizes.)
  *
  * Reference scope note: the reference engine (a single-node SQL
  * extension) has no clustering operator; this is part of the
  * LLM-pipeline surface built on top of the same dedup primitives.
  */
object Components {

  /** Cluster labels for every vertex appearing in `pairs`:
    * (doc, cluster) where cluster = min doc id reachable through the
    * undirected pair graph. Input columns default to the dedup operators'
    * (doc_a, doc_b) convention. */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
                          bCol: String = "doc_b", maxIter: Int = 30): DataFrame = {
    val sym = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("doc")).distinct()
      .withColumn("cluster", col("doc"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // order-independent signature of the label assignment; one Row per
    // round, constant-size — iteration CONTROL, not a data pull. XOR
    // (not sum) so the fold can't overflow under ANSI mode; rows are
    // unique per doc, so XOR self-cancellation can't occur.
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(
        coalesce(bit_xor(xxhash64(col("doc"), col("cluster"))), lit(0L)),
        count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    var sig = signature(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // label of dst flows to src; keep own label; take the min
      val prop = sym.join(labels, sym("dst") === labels("doc"))
        .select(sym("src").as("doc"), col("cluster"))
      val next = labels.select("doc", "cluster").union(prop)
        .groupBy("doc").agg(min("cluster").as("cluster"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nextSig = signature(next) // also materializes `next`
      labels.unpersist(blocking = false)
      labels = next
      converged = nextSig == sig
      sig = nextSig
      iter += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents stopped at maxIter=$maxIter WITHOUT converging: " +
          "labels are partially propagated and one component may carry multiple " +
          "cluster ids. Raise maxIter (graph diameter exceeds it).")
    // eager localCheckpoint materializes the final labels and cuts their
    // lineage, so every intermediate cached round (and sym) can be freed
    // here instead of leaking into the session until it ends
    val out = labels.localCheckpoint(eager = true)
    labels.unpersist(blocking = false)
    sym.unpersist(blocking = false)
    out
  }

  /** Canonical-document dedup: keep exactly one document per connected
    * near-dup cluster (the min-id member), and every document that is in
    * no pair. Output: the full `docs` schema. */
  def dedupByClusters(docs: DataFrame, pairs: DataFrame, idCol: String,
                      aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    // non-canonical members (doc != cluster) are the drop set — bounded
    // by the duplicate count, but NOT broadcast-hinted: a 50%-dup crawl
    // makes it O(corpus) and AQE must stay free to pick a shuffle join
    val drop = connectedComponents(pairs, aCol, bCol)
      .filter(col("doc") =!= col("cluster"))
      .select(col("doc").as("__drop_id"))
    docs.join(drop, docs(idCol) === col("__drop_id"), "left_anti")
  }
}
