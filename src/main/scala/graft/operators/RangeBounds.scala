package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-driven range partitioning — balanced output files without a
  * sampling job.
  *
  * Spark's `repartitionByRange` launches a reservoir-sampling pass
  * (RangePartitioner) every time it plans, and the sample is neither
  * persistable nor mergeable. A KLL sketch of the partition column gives
  * the same balanced cut points from ONE streaming pass — and because
  * sketches are mergeable values, the bounds can be built incrementally
  * (per ingest batch, unioned), stored next to the table, and reused for
  * every subsequent clustered write or pruning decision. At 100 TB that
  * turns "sample 100 TB, then shuffle 100 TB" into "merge yesterday's
  * sketch, then shuffle".
  *
  * Cut points use inclusive-rank quantiles; rows equal to a bound land in
  * the lower bucket, so bucket `i` covers `(b_i-1, b_i]`.
  */
object RangeBounds {

  /** `numPartitions - 1` ascending cut points for `colName`, from a KLL
    * sketch built in one pass (K trades accuracy for size; 400 ≈ 0.7%
    * rank error — a partition-balance skew of <1%, far tighter than
    * needed for file sizing). */
  def fromColumn(df: DataFrame, colName: String, numPartitions: Int,
                 kllK: Int = 400): Array[Double] = {
    require(numPartitions >= 2, "numPartitions must be >= 2")
    graft.Registration.register(df.sparkSession)
    val sk = df.agg(
      call_function("datasketch_kll", lit(kllK), col(colName).cast("double")).as("sk"))
    val probes = (1 until numPartitions)
      .map(i => i.toDouble / numPartitions)
    val row = sk.select(probes.map(r =>
        call_function("datasketch_kll_quantile", col("sk"), lit(r), lit(true))): _*)
      .head()
    probes.indices.map(row.getDouble).toArray
  }

  /** Map-side quantile-rank transform (feature normalization): every
    * value replaced by its approximate normalized rank (inclusive,
    * P[X ≤ v]) in the column's GLOBAL distribution — the
    * sketch-as-broadcast-model pattern. ONE aggregation pass builds a
    * KB-sized KLL blob; the transform is then a codegen'd scalar probe
    * per row against the 1-row broadcast (per-thread deserialization
    * memo ⇒ one heapify per task thread), with no join on data keys, no
    * sort, no second shuffle. The rank error is the sketch's normalized
    * rank error (~0.7% at K=400); the distributed-exact alternative is
    * a full ECDF join every time the feature is computed. */
  def rankTransform(df: DataFrame, colName: String, outCol: String = "rank",
                    kllK: Int = 400): DataFrame = {
    graft.Registration.register(df.sparkSession)
    val sk = df.agg(call_function("datasketch_kll",
      lit(kllK), col(colName).cast("double")).as("__rank_sk"))
    df.crossJoin(broadcast(sk)) // 1-row model broadcast
      .withColumn(outCol, call_function("datasketch_kll_rank",
        col("__rank_sk"), col(colName).cast("double"), lit(true)))
      .drop("__rank_sk")
  }

  /** Bucket id (0-based) for a value against ascending `bounds`:
    * the count of bounds strictly below the value. Codegen'd array fold —
    * no UDF. NULL values → bucket 0 (nulls-first, matching range
    * partitioning's null placement). */
  def bucket(c: Column, bounds: Seq[Double]): Column =
    coalesce(
      size(filter(array(bounds.map(lit): _*), b => b < c.cast("double"))),
      lit(0))

  /** Cluster `df` into `bounds.length + 1` contiguous value ranges
    * (partition i holds exactly bucket i) and sort within each — the
    * balanced sorted-write shape, with file-level min/max disjoint for
    * later pruning. One shuffle, bounds from the (possibly pre-computed,
    * merged, stored) sketch; no sampling job, unlike `repartitionByRange`.
    *
    * Placement detail: `repartition(n, bucketCol)` would HASH bucket ids
    * onto partitions, letting two ranges collide into one file — so the
    * shuffle uses an identity partitioner on the bucket id via the
    * internal-row RDD, then local sorts restore the Dataset API.
    */
  def repartitionByBounds(df: DataFrame, colName: String,
                          bounds: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.GraftShims
    val n = bounds.length + 1
    val withB = df.withColumn("__bucket", bucket(col(colName), bounds))
    val bucketOrdinal = withB.schema.fieldIndex("__bucket")
    val parted = withB.queryExecution.toRdd
      .mapPartitions(_.map(r => (r.getInt(bucketOrdinal), r.copy())))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = n
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .map(_._2)
    GraftShims.internalCreateDataFrame(df.sparkSession, parted, withB.schema)
      .sortWithinPartitions(col(colName))
      .drop("__bucket")
  }
}
