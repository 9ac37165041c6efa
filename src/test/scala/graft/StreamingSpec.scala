package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming: sketch aggregates as incremental window state. */
class StreamingSpec extends SparkTestBase {

  case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

  private def t(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $hour%02d:$minute%02d:00")

  test("windowed sketch aggregation across micro-batches merges state") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[Ev]
    val out = streaming.StreamingSketches.windowedProfile(
      mem.toDF(), window = "1 hour", slide = "1 hour", watermark = "10 hours")

    val query = out.writeStream
      .format("memory").queryName("stream_profile")
      .outputMode(OutputMode.Update())
      .start()
    try {
      // batch 1: three users in hour 10, two in hour 11
      mem.addData(
        Ev(t(10, 0), 1, "click", 10.0), Ev(t(10, 10), 2, "click", 20.0),
        Ev(t(10, 20), 3, "view", 30.0), Ev(t(11, 0), 7, "click", 5.0),
        Ev(t(11, 30), 8, "error", 6.0))
      query.processAllAvailable()
      // batch 2: one NEW user + one repeat in hour 10 → state must merge
      mem.addData(Ev(t(10, 40), 4, "view", 40.0), Ev(t(10, 50), 1, "click", 50.0))
      query.processAllAvailable()

      val rows = spark.sql(
        """SELECT window_start, approx_users, median_value
          |FROM stream_profile
          |ORDER BY window_start, approx_users""".stripMargin).collect()
      // last update for hour-10 window must count 4 distinct users
      val hour10 = rows.filter(_.getTimestamp(0) == t(10, 0))
      assert(hour10.map(_.getLong(1)).max == 4L,
        s"hour-10 distinct users should reach 4, got ${hour10.mkString(",")}")
      val hour11 = rows.filter(_.getTimestamp(0) == t(11, 0))
      assert(hour11.map(_.getLong(1)).max == 2L)
    } finally query.stop()
  }

  test("foreachBatch sink maintains a rollup-able parquet sketch table") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString

    val mem = MemoryStream[Ev]
    val query = streaming.StreamingSketches.sinkToSketchTable(
      mem.toDF(), dir, window = "1 hour", watermark = "10 hours")
    try {
      mem.addData(Ev(t(9, 0), 1, "click", 1.0), Ev(t(9, 30), 2, "view", 2.0))
      query.processAllAvailable()
      mem.addData(Ev(t(9, 45), 3, "click", 3.0)) // same window, new user
      query.processAllAvailable()

      // Roll up the appended sketch rows: duplicate window rows (one per
      // batch update) merge away through sketch union.
      spark.read.parquet(dir).createOrReplaceTempView("stream_sketches")
      val users = spark.sql(
        """SELECT window_start,
          |       CAST(round(datasketch_theta_estimate(datasketch_theta(users_sketch))) AS BIGINT) AS users
          |FROM stream_sketches GROUP BY window_start""".stripMargin).collect()
      assert(users.length == 1)
      assert(users.head.getLong(1) == 3L,
        s"rollup over batch updates must merge to 3 distinct users, got ${users.head}")
    } finally query.stop()
  }
}
