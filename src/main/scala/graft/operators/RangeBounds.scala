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
