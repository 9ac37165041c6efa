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
        col("users_sketch"))
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
