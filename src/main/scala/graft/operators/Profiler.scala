package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions._

/** One-pass column profiler (SURVEY §7.4 beyond-parity roadmap): for every
  * requested column, builds KLL + HLL + FrequentItems in a single scan of
  * the table — the sketch-native answer to "profile 100 TB without three
  * full passes". All sketches ride the same partial-aggregation shuffle.
  *
  * Output: one row per column with (column, approx_distinct, n, min, max,
  * p50, p95, top_items). Numeric columns get quantiles; all columns get
  * distinct counts and heavy hitters.
  */
object Profiler {

  def profile(df: DataFrame, columns: Seq[String],
              lgK: Int = 12, kllK: Int = 200, freqLgK: Int = 10): DataFrame = {
    val spark = df.sparkSession
    graft.Registration.register(spark)
    val numeric = columns.filter(c => df.schema(c).dataType match {
      case _: NumericType => true
      case _ => false
    }).toSet

    // Single aggregation pass: every sketch for every column at once.
    val aggs = columns.flatMap { c =>
      val hll = datasketch_hll(lgK, col(c)).as(s"${c}__hll")
      val freq = datasketch_frequent_items(freqLgK, col(c)).as(s"${c}__freq")
      if (numeric(c))
        Seq(hll, freq, datasketch_kll(kllK, col(c).cast("double")).as(s"${c}__kll"))
      else Seq(hll, freq)
    }
    val sk = df.agg(aggs.head, aggs.tail: _*)

    // Unpivot to one row per column, probing each sketch.
    val rows = columns.map { c =>
      val kllCol = if (numeric(c)) col(s"${c}__kll") else lit(null).cast("binary")
      struct(
        lit(c).as("column"),
        round(sketch_fn("hll", "estimate", col(s"${c}__hll")), 1).as("approx_distinct"),
        when(kllCol.isNotNull, sketch_fn("kll", "n", kllCol)).as("n"),
        when(kllCol.isNotNull, sketch_fn("kll", "min_item", kllCol)).as("min"),
        when(kllCol.isNotNull, sketch_fn("kll", "max_item", kllCol)).as("max"),
        when(kllCol.isNotNull, sketch_fn("kll", "quantile", kllCol, lit(0.5), lit(true))).as("p50"),
        when(kllCol.isNotNull, sketch_fn("kll", "quantile", kllCol, lit(0.95), lit(true))).as("p95"),
        transform(
          slice(sketch_fn("frequent_items", "get_frequent", col(s"${c}__freq")), 1, 5),
          f => f.getField("item")).as("top_items"))
    }
    sk.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Snapshot-over-snapshot profile drift — the ops question "did this
    * table change shape since yesterday?" answered from TWO aggregation
    * passes (one per snapshot) regardless of column count: exact row and
    * null counts, HLL distinct-count ratio, and (numeric columns) the
    * KLL two-sample KS distance. The comparison itself is a 1-row ×
    * 1-row join of sketch blobs probed scalar-side — and since the per-
    * snapshot aggregates are mergeable sketches, a deployment stores
    * them per snapshot and answers every later drift question without
    * touching either snapshot again.
    *
    * Output: one row per column —
    * (column, n_a, n_b, null_a, null_b, approx_distinct_a,
    *  approx_distinct_b, ks) with ks NULL for non-numeric columns. */
  def profileDrift(a: DataFrame, b: DataFrame, columns: Seq[String],
                   lgK: Int = 12, kllK: Int = 200): DataFrame = {
    graft.Registration.register(a.sparkSession)
    val numeric = columns.filter(c => a.schema(c).dataType match {
      case _: NumericType => true
      case _ => false
    }).toSet
    def side(df: DataFrame, tag: String): DataFrame = {
      val aggs = count(lit(1)).as(s"n__$tag") +: columns.flatMap { c =>
        val base = Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls_$tag"),
          datasketch_hll(lgK, col(c)).as(s"${c}__hll_$tag"))
        if (numeric(c))
          base :+ datasketch_kll(kllK, col(c).cast("double")).as(s"${c}__kll_$tag")
        else base
      }
      df.agg(aggs.head, aggs.tail: _*)
    }
    val joined = side(a, "a").crossJoin(side(b, "b")) // 1 row × 1 row
    val rows = columns.map { c =>
      val ks =
        if (numeric(c))
          sketch_fn("kll", "ks", col(s"${c}__kll_a"), col(s"${c}__kll_b"))
        else lit(null).cast("double")
      struct(
        lit(c).as("column"),
        col("n__a").as("n_a"), col("n__b").as("n_b"),
        col(s"${c}__nulls_a").as("null_a"), col(s"${c}__nulls_b").as("null_b"),
        round(sketch_fn("hll", "estimate", col(s"${c}__hll_a")), 1).as("approx_distinct_a"),
        round(sketch_fn("hll", "estimate", col(s"${c}__hll_b")), 1).as("approx_distinct_b"),
        ks.as("ks"))
    }
    joined.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
