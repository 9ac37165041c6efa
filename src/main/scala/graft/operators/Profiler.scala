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
}
