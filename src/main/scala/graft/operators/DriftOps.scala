package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two slices of a table: the
  * production path is the sketch-native two-sample KS
  * (`datasketch_kll_ks` over two KLL blobs — one aggregation pass, then
  * a scalar probe of two KB summaries), with an EXACT distributed KS as
  * its oracle-truth twin.
  *
  * The exact form is deliberately NOT the single-task global-ECDF window:
  * it pre-aggregates per distinct value (an AQE-splittable shuffle that
  * also resolves ties exactly), then runs the q58 two-level prefix scan —
  * range partition, partition-local cumulative sums, a P-row offset
  * relation broadcast back. Only the P-row step is single-task at any
  * scale. */
object DriftOps {

  /** One row: (ks_sketch, eps) — the KLL KS delta between the `isA` and
    * `!isA` slices of `valueCol`, plus the two sketches' summed
    * normalized rank error (the band the sketch delta is inside of,
    * w.h.p., relative to the exact delta). Builds both sketches in ONE
    * aggregation pass via NULL-skip routing. */
  def sketchKs(df: DataFrame, valueCol: String, isA: Column, k: Int = 200): DataFrame =
    df.select(col(valueCol).cast("double").as("v"), isA.as("is_a"))
      .filter(col("v").isNotNull)
      .agg(
        expr(s"datasketch_kll($k, CASE WHEN is_a THEN v END)").as("sk_a"),
        expr(s"datasketch_kll($k, CASE WHEN NOT is_a THEN v END)").as("sk_b"))
      .select(
        expr("datasketch_kll_ks(sk_a, sk_b)").as("ks_sketch"),
        (expr("datasketch_kll_normalized_rank_error(sk_a, false)") +
          expr("datasketch_kll_normalized_rank_error(sk_b, false)")).as("eps"))

  /** One row: (ks_exact) — the exact two-sample KS distance, distributed.
    * Counts are exact integers end-to-end; the only doubles are the final
    * per-row divisions, so the result is bit-stable across engines. */
  def exactKs(df: DataFrame, valueCol: String, isA: Column): DataFrame = {
    val vals = df.select(col(valueCol).cast("double").as("v"),
        when(isA, 1L).otherwise(0L).as("ia"))
      .filter(col("v").isNotNull)
    // exact tie resolution + data shrink: one row per distinct value
    val dist = vals.groupBy("v")
      .agg(sum("ia").as("da"), sum(lit(1L) - col("ia")).as("db"))
    // two-level prefix scan (the Sharding.tokenShards shape)
    val ranged = dist.repartitionByRange(col("v")).withColumn("pid", spark_partition_id())
    val w = Window.partitionBy("pid").orderBy("v")
    val local = ranged
      .withColumn("ca", sum("da").over(w))
      .withColumn("cb", sum("db").over(w))
    val totals = local.groupBy("pid").agg(sum("da").as("ta"), sum("db").as("tb"))
    val pw = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals // P rows: the only single-task scan
      .withColumn("oa", coalesce(sum("ta").over(pw), lit(0L)))
      .withColumn("ob", coalesce(sum("tb").over(pw), lit(0L)))
      .select("pid", "oa", "ob")
    val n = totals.agg(sum("ta").cast("double").as("na"),
      sum("tb").cast("double").as("nb")) // 1 row
    local.join(broadcast(offsets), "pid")
      .crossJoin(broadcast(n))
      .agg(max(abs((col("ca") + col("oa")) / col("na")
        - (col("cb") + col("ob")) / col("nb"))).as("ks_exact"))
  }
}
