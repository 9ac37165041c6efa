package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._

/** Structured Streaming sketch aggregation.
  *
  * Sketches are mergeable monoids, which makes them ideal streaming state:
  * Spark's incremental aggregation keeps one sketch buffer per
  * (window, key) group and merges partial sketches across micro-batches —
  * exactly the partial/final lifecycle the batch path uses, so no extra
  * code is needed beyond the watermark/window declaration. At 100 TB/day
  * this is the pattern for continuous distinct-count / quantile / heavy-
  * hitter dashboards: state size is bounded by (windows × groups ×
  * sketch-size), independent of event volume.
  */
object StreamingSketches {

  /** Sliding-window distinct users + median value + event-type heavy
    * hitters over an event stream.
    *
    * @param events streaming DataFrame with (ts TIMESTAMP, user_id LONG,
    *               event_type STRING, value DOUBLE)
    */
  def windowedProfile(events: DataFrame,
                      window: String = "1 hour",
                      slide: String = "1 hour",
                      watermark: String = "2 hours"): DataFrame = {
    graft.Registration.register(events.sparkSession)
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide))
      .agg(
        datasketch_theta(col("user_id")).as("users_sketch"),
        datasketch_kll(200, col("value")).as("value_sketch"),
        datasketch_frequent_items(col("event_type")).as("type_sketch"))
      .select(
        col("window.start").as("window_start"),
        round(datasketch_theta_estimate(col("users_sketch"))).cast("long").as("approx_users"),
        datasketch_kll_quantile(col("value_sketch"), 0.5).as("median_value"),
        transform(slice(datasketch_frequent_items_get_frequent(col("type_sketch")), 1, 3),
          f => f.getField("item")).as("top_types"),
        // keep the mergeable state for downstream re-aggregation
        col("users_sketch"), col("value_sketch"))
  }

  /** Streaming drift, closed over the sketch-table sink: roll up each
    * window's KLL rows (duplicate update-mode rows merge away through
    * sketch idempotence), then probe consecutive windows with
    * `datasketch_kll_ks` — the q94 drift series over a CONTINUOUSLY
    * maintained table. No new streaming state machinery is needed:
    * mergeability makes the sink itself the cross-window state, and
    * each drift refresh touches only the window-count-sized sketch
    * table, never the event stream's history. Output per consecutive
    * window pair: (window_start, ks, eps) with eps = the two sketches'
    * summed normalized rank error + one combined ECDF step. */
  def driftFromSketchTable(spark: org.apache.spark.sql.SparkSession,
                           path: String, k: Int = 200): DataFrame = {
    graft.Registration.register(spark)
    import org.apache.spark.sql.expressions.Window
    val rolled = spark.read.parquet(path)
      .groupBy(col("window_start"))
      .agg(call_function("datasketch_kll", lit(k), col("value_sketch")).as("sk"))
    // one row per window — bounded like the two-level scans' P-row step
    val w = Window.orderBy("window_start")
    rolled
      .withColumn("prev", lag(col("sk"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("window_start"),
        call_function("datasketch_kll_ks", col("prev"), col("sk")).as("ks"),
        (call_function("datasketch_kll_normalized_rank_error", col("prev"), lit(false))
          + call_function("datasketch_kll_normalized_rank_error", col("sk"), lit(false))
          + lit(1.0) / call_function("datasketch_kll_n", col("prev")).cast("double")
          + lit(1.0) / call_function("datasketch_kll_n", col("sk")).cast("double")).as("eps"))
  }

  /** Continuous sketch-table maintenance: append each micro-batch's
    * windowed sketches to a partitioned parquet sketch table
    * (`foreachBatch`). Readers roll up with the merge aggregates
    * (`datasketch_theta(users_sketch)` etc.) — duplicate window rows from
    * successive batch updates merge away because sketch union is
    * idempotent, so the sink needs no upsert machinery. This closes the
    * streaming → lakehouse loop on [[graft.operators.SketchTable]]'s
    * storage pattern. */
  def sinkToSketchTable(events: DataFrame, path: String,
                        window: String = "1 hour",
                        watermark: String = "2 hours"):
      org.apache.spark.sql.streaming.StreamingQuery = {
    windowedProfile(events, window, window, watermark)
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.withColumn("batch_id", org.apache.spark.sql.functions.lit(id))
          .write.mode("append").parquet(path)
      }
      .start()
  }
}
