package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
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
    * (doc_a, doc_b) convention.
    *
    * Adaptive: the pair-set size is measured on the cached edge set (one
    * cheap count — the mining cost is already paid), and graphs at or
    * under `localEdgeLimit` symmetrized edges are solved with a driver
    * union-find instead of the iterative join loop. Near-dup evidence is
    * duplicate-rate-sized, not corpus-sized — KB to low MB after any real
    * dedup filter — and the distributed loop pays O(log d) rounds of
    * (join + aggregate + checkpoint) fixed cost that dwarfs a
    * sub-second union-find on such graphs. The distributed path stays
    * the automatic fallback for crawl-scale pair graphs (50%-dup crawls
    * make the evidence O(corpus)) and for non-integral id types; both
    * paths compute identical labels (parity-pinned in OperatorsSpec). */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
                          bCol: String = "doc_b", maxIter: Int = 30,
                          localEdgeLimit: Long = 1L << 20): DataFrame = {
    val sym = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // both id columns must share one integral type: the cast-back below
    // restores the exact input type, and a mixed (int, long) pair input
    // would otherwise silently narrow one side. Null ids (degenerate but
    // expressible input) are detected with one distributed scan of the
    // persisted edge set BEFORE any driver pull, and fall through to the
    // distributed path, whose null semantics stand.
    val idType = pairs.select(col(aCol)).schema.head.dataType
    val integral = idType == pairs.select(col(bCol)).schema.head.dataType &&
      Set[org.apache.spark.sql.types.DataType](
        LongType, IntegerType, ShortType, ByteType)(idType)
    if (integral && sym.count() <= localEdgeLimit) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val lsym = sym.select(col("src").cast("long").as("_1"),
        col("dst").cast("long").as("_2"))
      if (lsym.filter(col("_1").isNull || col("_2").isNull).isEmpty) {
        // ≤ localEdgeLimit boxed (Long, Long) tuples — order 100 MB of
        // driver heap at the default 2^20 limit, not the raw 16 B/edge: a
        // bounded, documented pull in the same class as the hot-list and
        // pair-evidence memos. Typed collect, so no per-row GenericRow
        // wrapper on top of the boxing.
        val edges = lsym.as[(Long, Long)].collect()
        sym.unpersist(blocking = false)
        // union-find, path-halving, union-by-min-root: the root of every
        // set is its minimum member, matching the distributed min-label fixpoint
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
          r
        }
        edges.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val rows = parent.keysIterator.map(v => (v, find(v))).toSeq
        return spark.createDataset(rows).toDF("doc", "cluster")
          .select(col("doc").cast(idType).as("doc"),
            col("cluster").cast(idType).as("cluster"))
      }
      // null ids present: fall through to the distributed loop, whose
      // null semantics (no propagation through a null vertex) stand
    }
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
