package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._

/** The lakehouse sketch-rollup pattern (README §100 TB design notes):
  * materialize per-(partition, key) sketches ONCE from raw data, then
  * answer every subsequent distinct-count / quantile / heavy-hitter
  * question by merging KB-sized sketch blobs — never rescanning raw rows.
  *
  * At 100 TB: the build is one full scan writing a table thousands of
  * times smaller than the source (one row per partition×key, each row a
  * few KB of sketch bytes); rollups over arbitrary key subsets then run
  * in seconds on a single executor's worth of data. This is the direct
  * Spark analog of the reference corpus's CTAS-partial-sketches pattern
  * (`test/sql/datasketch_kll.test:134-138`) elevated to a storage layout.
  */
object SketchTable {

  /** Build a daily sketch table from an event-like DataFrame.
    *
    * @param df        source with a timestamp column, a user/id column, a
    *                  categorical column, and a numeric value column
    * @return (day, key) grain table with mergeable sketch columns, typed
    *         via `as_sketch` metadata so downstream binds resolve blindly
    */
  def buildDaily(df: DataFrame, tsCol: String, keyCol: String,
                 idCol: String, valueCol: String): DataFrame = {
    graft.Registration.register(df.sparkSession)
    df.groupBy(to_date(col(tsCol)).as("day"), col(keyCol).as("key"))
      .agg(
        count("*").as("rows"),
        datasketch_theta(col(idCol)).as("ids_theta"),
        datasketch_hll(12, col(idCol)).as("ids_hll"),
        datasketch_kll(200, col(valueCol)).as("value_kll"),
        datasketch_frequent_items(col(keyCol)).as("key_freq"))
      .select(col("day"), col("key"), col("rows"),
        as_sketch(col("ids_theta"), "ids_theta", "theta"),
        as_sketch(col("ids_hll"), "ids_hll", "hll"),
        as_sketch(col("value_kll"), "value_kll", "kll", "double"),
        as_sketch(col("key_freq"), "key_freq", "frequent_items"))
  }

  /** Persist partitioned by day — rollups over a date range prune to the
    * matching files (partition pruning happens before any sketch work). */
  def save(table: DataFrame, path: String): Unit =
    table.write.mode("overwrite").partitionBy("day").parquet(path)

  /** Roll the sketch table up to one row per key over a day range: every
    * metric comes from merging stored sketches, no raw-data access. */
  def rollup(spark: SparkSession, path: String,
             fromDay: String, toDay: String): DataFrame = {
    graft.Registration.register(spark)
    spark.read.parquet(path)
      .filter(col("day") >= lit(fromDay) && col("day") <= lit(toDay))
      .groupBy("key")
      .agg(
        sum("rows").as("rows"),
        datasketch_theta(col("ids_theta")).as("ids_theta"),
        datasketch_hll_union(12, col("ids_hll")).as("ids_hll"),
        call_fn("datasketch_kll", lit(200), col("value_kll")).as("value_kll"))
      .select(col("key"), col("rows"),
        round(datasketch_theta_estimate(col("ids_theta"))).cast("long").as("approx_ids"),
        round(datasketch_hll_estimate(col("ids_hll"))).cast("long").as("approx_ids_hll"),
        datasketch_kll_quantile(col("value_kll"), 0.5).as("median_value"),
        datasketch_kll_quantile(col("value_kll"), 0.99).as("p99_value"))
  }

  private def call_fn(name: String, cols: org.apache.spark.sql.Column*) =
    org.apache.spark.sql.functions.call_function(name, cols: _*)
}
