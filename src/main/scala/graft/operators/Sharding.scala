package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing for training-data pipelines: assign each
  * document to the shard whose running token total (in a deterministic
  * global document order) its first token falls into —
  * `shard = floor(prefix_tokens_before_doc / budget)`.
  *
  * The naive formulation is a single global running-sum window, which
  * Spark executes as ONE task over the whole corpus — the canonical
  * 100 TB scale-killer. This operator computes the same prefix sum with
  * the classic two-level distributed scan:
  *
  *   1. range-partition by the order key (so partition index order IS
  *      global key order),
  *   2. partition-local cumulative sums via a window PARTITIONED BY the
  *      partition id (parallelism = partition count),
  *   3. per-partition totals (one row per partition) prefix-summed on a
  *      P-row relation, broadcast back as offsets.
  *
  * Only step 3 is single-task, over P rows (KB-sized at any scale).
  * The result is byte-identical to the global window — pinned by a
  * parity test and the DuckDB oracle (q58).
  */
object Sharding {

  /** Per-document shard assignment: (doc, ntok, shard). */
  def tokenShards(df: DataFrame, idCol: String, textCol: String,
                  budget: Long): DataFrame = {
    require(budget > 0, s"shard token budget must be positive, got $budget")
    val toks = df.select(col(idCol).as("doc"),
      TextOps.tokenCount(col(textCol)).cast("long").as("ntok"))
    // step 1: range partitioning makes partition-id order = global order
    val ranged = toks.repartitionByRange(col("doc"))
      .withColumn("pid", spark_partition_id())
    // step 2: local scan, parallel across partitions
    val local = ranged.withColumn("cum",
      sum("ntok").over(Window.partitionBy("pid").orderBy("doc")))
    // step 3: P-row prefix of partition totals → per-partition offset
    val offsets = local.groupBy("pid").agg(sum("ntok").as("ptotal"))
      .withColumn("offset", coalesce(
        sum("ptotal").over(Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "offset")
    local.join(broadcast(offsets), "pid") // bounded: one row per partition
      .withColumn("shard", floor((col("cum") + col("offset") - col("ntok")) / budget))
      .select(col("doc"), col("ntok"), col("shard"))
  }

  /** Reference formulation: one global window (single task — correctness
    * baseline for the parity test, never the production path). */
  private[graft] def tokenShardsGlobal(df: DataFrame, idCol: String,
                                       textCol: String, budget: Long): DataFrame =
    df.select(col(idCol).as("doc"),
        TextOps.tokenCount(col(textCol)).cast("long").as("ntok"))
      .withColumn("shard", floor(
        (sum("ntok").over(Window.orderBy("doc")) - col("ntok")) / budget))
      .select(col("doc"), col("ntok"), col("shard"))
}
