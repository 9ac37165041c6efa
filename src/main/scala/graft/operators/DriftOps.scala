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

  /** One row: (psi_sketch) — Population Stability Index between the two
    * slices over `bins` equi-width bins of the pooled [min, max] range,
    * computed from the two KLL sketches' PMF probes (the monitoring-
    * dashboard form: bin masses come from stored KB blobs, not a data
    * pass). Zero bins are clipped to 1e-4 before the log (the standard
    * PSI convention, mirrored exactly by [[exactPsi]] and the oracle). */
  def sketchPsi(df: DataFrame, valueCol: String, isA: Column,
                bins: Int = 10, k: Int = 200): DataFrame = {
    require(bins >= 2 && bins <= 1024, s"psi bins must be in [2,1024], got $bins")
    val sk = df.select(col(valueCol).cast("double").as("v"), isA.as("is_a"))
      .filter(col("v").isNotNull)
      .agg(
        expr(s"datasketch_kll($k, CASE WHEN is_a THEN v END)").as("sk_a"),
        expr(s"datasketch_kll($k, CASE WHEN NOT is_a THEN v END)").as("sk_b"),
        min("v").as("lo"), max("v").as("hi"))
      .withColumn("w", (col("hi") - col("lo")) / bins)
    val splits = array((1 until bins).map(i => col("lo") + lit(i) * col("w")): _*)
    def clip(c: Column) = greatest(c, lit(1e-4))
    sk.withColumn("splits", splits)
      .withColumn("pa", expr("datasketch_kll_pmf(sk_a, splits, false)"))
      .withColumn("pb", expr("datasketch_kll_pmf(sk_b, splits, false)"))
      .select(aggregate(
        zip_with(col("pa"), col("pb"), (p, q) =>
          (clip(p) - clip(q)) * log(clip(p) / clip(q))),
        lit(0.0d), (acc, x) => acc + x).as("psi_sketch"))
  }

  /** One row: (psi_exact) — the exact PSI twin: equi-width bin counts
    * via a bins-bounded aggregation (scales like any grouped count),
    * contributions summed in bin order so the oracle's `list(... ORDER
    * BY bin)` fold adds the identical IEEE addends. */
  def exactPsi(df: DataFrame, valueCol: String, isA: Column, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1024, s"psi bins must be in [2,1024], got $bins")
    val vals = df.select(col(valueCol).cast("double").as("v"),
        when(isA, 1L).otherwise(0L).as("ia"))
      .filter(col("v").isNotNull)
    val mm = vals.agg(min("v").as("lo"), max("v").as("hi")) // 1 row
    val binned = vals.crossJoin(broadcast(mm))
      .withColumn("bin", when(col("hi") === col("lo"), lit(0L))
        .otherwise(least(floor((col("v") - col("lo"))
          / ((col("hi") - col("lo")) / bins)), lit((bins - 1).toLong))))
    val counts = binned.groupBy("bin")
      .agg(sum("ia").as("ca"), sum(lit(1L) - col("ia")).as("cb"))
    val n = counts.agg(sum("ca").cast("double").as("na"),
      sum("cb").cast("double").as("nb")) // 1 row
    def clip(c: Column) = greatest(c, lit(1e-4))
    counts.crossJoin(broadcast(n))
      .withColumn("p", clip(col("ca") / col("na")))
      .withColumn("q", clip(col("cb") / col("nb")))
      .withColumn("contrib", (col("p") - col("q")) * log(col("p") / col("q")))
      .agg(sort_array(collect_list(struct(col("bin"), col("contrib")))).as("arr"))
      .select(aggregate(col("arr"), lit(0.0d),
        (acc, x) => acc + x.getField("contrib")).as("psi_exact"))
  }

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
