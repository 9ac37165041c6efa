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

  /** Hour-over-hour drift series: one KLL blob per hour, KS probed
    * between consecutive (existing) hours via a lag window over the
    * BLOBS — the production monitoring shape: sketches are stored once
    * and drift is a scalar probe, no re-scan per question. Alongside,
    * the exact per-pair two-sample KS (per-pair windows, parallel
    * across pairs) as the in-query truth.
    *
    * Output per pair: (h, ks_sketch, ks_exact, eps) where `eps` =
    * summed normalized rank errors + one combined ECDF step
    * (1/na + 1/nb). The step term bounds the library's merge-walk
    * evaluation, which probes CDF differences at sorted-view frontier
    * pairs rather than the textbook sup over ≤-ECDFs — measured ≤0.55
    * of a combined step on this corpus, and 0 when both distributions
    * are identical.
    *
    * The lag window is one row per HOUR — bounded like the two-level
    * scans' P-row step; partition it by day/month at larger spans. */
  def ksSeries(events: DataFrame, tsCol: String, valueCol: String,
               k: Int = 200): DataFrame = {
    val e = events
      .select(date_trunc("hour", col(tsCol)).as("h"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val hourly = e.groupBy("h")
      .agg(expr(s"datasketch_kll($k, v)").as("sk"), count(lit(1)).as("n"))
    val w = Window.orderBy("h")
    val sketchSide = hourly
      .withColumn("prev", lag(col("sk"), 1).over(w))
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("h"),
        expr("datasketch_kll_ks(prev, sk)").as("ks_sketch"),
        (expr("datasketch_kll_normalized_rank_error(prev, false)")
          + expr("datasketch_kll_normalized_rank_error(sk, false)")
          + lit(1.0) / col("prev_n") + lit(1.0) / col("n")).as("eps"))
    // exact side: every event is the 'current' of its own pair and the
    // 'prev' of the next existing hour's pair. The hour-pair relation is
    // hours-sized but grows with the time span, so the joins are plain
    // equi-joins — AQE broadcasts them while they fit and splits them
    // when they don't (the scale-killer sweep's contract)
    val hp = hourly.select(col("h").as("p"))
      .withColumn("ph", lag(col("p"), 1).over(Window.orderBy("p")))
      .filter(col("ph").isNotNull)
    val ma = e.join(hp, col("h") === col("ph"))
      .select(col("p"), col("v"), lit(1L).as("ia"))
    val mb = e.join(hp.select("p"), col("h") === col("p"))
      .select(col("p"), col("v"), lit(0L).as("ia"))
    val d = ma.unionByName(mb).groupBy("p", "v")
      .agg(sum("ia").as("da"), sum(lit(1L) - col("ia")).as("db"))
    val wp = Window.partitionBy("p").orderBy("v")
    val n = d.groupBy("p").agg(sum("da").cast("double").as("na"),
      sum("db").cast("double").as("nb"))
    val exact = d
      .withColumn("ca", sum("da").over(wp))
      .withColumn("cb", sum("db").over(wp))
      .join(n, "p")
      .groupBy("p")
      .agg(max(abs(col("ca") / col("na") - col("cb") / col("nb"))).as("ks_exact"))
    sketchSide.join(exact, col("h") === col("p")).drop("p")
  }

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
    val psi = aggregate(
      zip_with(col("pa"), col("pb"), (p, q) =>
        (clip(p) - clip(q)) * log(clip(p) / clip(q))),
      lit(0.0d), (acc, x) => acc + x)
    sk.withColumn("splits", splits)
      .withColumn("pa", expr("datasketch_kll_pmf(sk_a, splits, false)"))
      .withColumn("pb", expr("datasketch_kll_pmf(sk_b, splits, false)"))
      // constant column: every split point coincides (the PMF probe
      // requires strictly increasing splits) — but a width-0 range means
      // both slices hold one identical value, so PSI is exactly 0
      .select(when(col("hi") === col("lo"), lit(0.0d))
        .otherwise(psi).as("psi_sketch"))
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
