package graft

import org.apache.spark.sql.functions._

/** Sketch-table build → persist → rollup: distinct counts and quantiles
  * from merged stored sketches must match direct computation on raw data. */
class SketchTableSpec extends SparkTestBase {

  test("daily sketch table rollup matches direct raw-data answers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_st").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = normalizeEventTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))

    val table = operators.SketchTable.buildDaily(
      events, "ts", "event_type", "user_id", "value")
    operators.SketchTable.save(table, dir)

    val stored = spark.read.parquet(dir)
    assert(stored.schema("ids_theta").dataType ==
      org.apache.spark.sql.types.BinaryType)

    val (from, to) = ("1970-01-01", "2100-01-01") // full range
    val rolled = operators.SketchTable.rollup(spark, dir, from, to)
      .orderBy("key").collect()

    val direct = events.groupBy(col("event_type").as("key"))
      .agg(count("*").as("rows"),
        countDistinct("user_id").as("ids"))
      .orderBy("key").collect()

    assert(rolled.length == direct.length)
    rolled.zip(direct).foreach { case (r, d) =>
      assert(r.getString(0) == d.getString(0))
      assert(r.getLong(1) == d.getLong(1), s"rows for ${r.getString(0)}")
      // distinct user counts are small (≤150) → theta exact, hll exact
      assert(r.getLong(2) == d.getLong(2), s"theta ids for ${r.getString(0)}")
      assert(r.getLong(3) == d.getLong(2), s"hll ids for ${r.getString(0)}")
      assert(!r.isNullAt(4) && !r.isNullAt(5))
    }

    // date-range pruning: empty range → no rows, no error
    assert(operators.SketchTable.rollup(spark, dir, "1970-01-01", "1970-01-02")
      .collect().isEmpty)
  }

  test("materialized ANN index: partition-pruned probes match runtime LSH") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ann").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    operators.AnnIndex.build(emb, "vec_id", "embedding", dir, planes = 6)

    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    val fromIndex = operators.AnnIndex.query(spark, dir, q, "vec_id", "embedding",
        k = 3, planes = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val runtime = operators.SimilarityOps.lshTopK(q, emb, "vec_id", "embedding",
        k = 3, planes = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(fromIndex == runtime,
      "index probes must return exactly the runtime LSH results")

    // the probe plan must prune on the sig partition column
    val plan = operators.AnnIndex.query(spark, dir, q, "vec_id", "embedding", 3, 6)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("dynamicpruning"),
      s"probe should prune partitions:\n$plan")
  }
}
