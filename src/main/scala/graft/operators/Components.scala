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
  * Algorithm: iterative min-label propagation WITH POINTER JUMPING on
  * the symmetrized edge set. Each round takes the min over three label
  * sources per vertex — its own label, its neighbors' labels (one
  * equi-join), and its label's label l(l(v)) (one self-join of the label
  * table) — then min-aggregates. Everything shuffles only (id, label)
  * pairs, never text. Neighbor propagation alone needs O(diameter)
  * rounds; the l(l(v)) jump halves label-chain depth each round, so
  * convergence is O(log diameter) — the same idea as the published
  * alternating large-star/small-star scheme, in its simplest form. That
  * bound matters twice at scale: fewer rounds of shuffles, and a
  * bounded logical-plan depth (each round's plan references the
  * previous round's, so Catalyst re-analysis cost grows with round
  * count — at O(d) rounds on a diameter-20 graph the ANALYSIS, not the
  * data, was the measured bottleneck).
  *
  * Convergence is detected with an order-independent hash signature of
  * the label table (a single scalar aggregate per round, no driver-side
  * data pull); `maxIter` guards pathological cases (non-convergence at
  * `maxIter` is logged — partially-propagated labels would otherwise
  * silently split clusters). Each round's result is persisted and the
  * previous round unpersisted, so RECOMPUTATION is bounded to one
  * round. The returned labels are eagerly local-checkpointed so all
  * intermediate cached rounds can be freed before returning (no cache
  * leak into the session); the trade-off is that losing an executor
  * after return re-fails the job instead of recomputing — acceptable
  * for a bounded (id, label) table that the caller consumes promptly.
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
    // Eager localCheckpoint each round, NOT persist: the next round's plan
    // references this round's THREE times (self + neighbor-prop + jump),
    // so without lineage truncation the logical plan grows EXPONENTIALLY
    // in rounds — a diameter-10 graph OOMed the DRIVER on Catalyst
    // analysis before any executor did real work. A checkpoint makes each
    // round a leaf: O(1) plan, O(1) analysis, recomputation impossible.
    // Superseded rounds' checkpoint RDDs are freed by the ContextCleaner
    // once unreferenced.
    var labels = sym.select(col("src").as("doc")).distinct()
      .withColumn("cluster", col("doc"))
      .localCheckpoint(true)
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
      // label of dst flows to src; keep own label; pointer-jump l(l(v));
      // take the min of all three
      val prop = sym.join(labels, sym("dst") === labels("doc"))
        .select(sym("src").as("doc"), col("cluster"))
      val jump = labels.as("x").join(labels.as("y"),
          col("x.cluster") === col("y.doc"))
        .select(col("x.doc").as("doc"), col("y.cluster").as("cluster"))
      val next = labels.select("doc", "cluster").union(prop).union(jump)
        .groupBy("doc").agg(min("cluster").as("cluster"))
        .localCheckpoint(true) // eager: materializes and truncates lineage
      val nextSig = signature(next) // constant-cost scan of the leaf
      // free the superseded round's checkpoint blocks NOW: the
      // ContextCleaner only reclaims them after a periodic driver GC
      // (default every 30 min), so iterative callers would otherwise
      // accumulate one block set per round in block-manager storage
      Components.checkpointRdd(labels).foreach(_.unpersist(blocking = false))
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
    // labels is already a materialized checkpoint leaf with no lineage
    // into sym, so the edge cache can be freed before returning (no cache
    // leak into the session)
    sym.unpersist(blocking = false)
    labels
  }

  /** The checkpointed RDD backing an eagerly local-checkpointed
    * DataFrame (its plan is a single LogicalRDD leaf). Exposed so the
    * OWNER of a result can free its blocks without waiting for the
    * ContextCleaner's periodic GC; only safe once the DataFrame will
    * never be read again (checkpoint blocks cannot be recomputed). */
  def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
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
