package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Bucketed point-in-interval join: exactness vs the naive non-equi join,
  * boundary/degenerate cases, the expansion fail-fast, and the plan shape
  * (hash/merge equi-join, never a nested-loop). */
class RangeJoinSpec extends SparkTestBase {

  private val rnd = new Random(109)

  private def naive(points: Seq[(Long, Long)], ivs: Seq[(Long, Long, Long)]) =
    (for {
      (pid, t) <- points
      (iid, lo, hi) <- ivs
      if t >= lo && t <= hi
    } yield (pid, iid)).sorted

  private def run(points: Seq[(Long, Long)], ivs: Seq[(Long, Long, Long)],
                  w: Long): Seq[(Long, Long)] = {
    import spark.implicits._
    val p = points.toDF("pid", "t")
    val i = ivs.toDF("iid", "lo", "hi")
    RangeJoin.pointInInterval(p, "t", i, "lo", "hi", w)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
  }

  test("matches the naive join on random data, several widths") {
    for (w <- Seq(1L, 3L, 7L, 50L, 1000L)) {
      val points = Seq.tabulate(300)(i => (i.toLong, rnd.nextInt(500).toLong))
      val ivs = Seq.tabulate(40) { i =>
        val lo = rnd.nextInt(500).toLong
        (i.toLong, lo, lo + rnd.nextInt(60))
      }
      assert(run(points, ivs, w) == naive(points, ivs), s"w=$w")
    }
  }

  test("inclusive boundaries: points exactly at lo and hi match") {
    val points = Seq((1L, 10L), (2L, 20L), (3L, 9L), (4L, 21L))
    val ivs = Seq((100L, 10L, 20L))
    assert(run(points, ivs, w = 4) == Seq((1L, 100L), (2L, 100L)))
  }

  test("interval spanning many buckets meets each point exactly once") {
    val points = Seq.tabulate(50)(i => (i.toLong, i.toLong * 2))
    val ivs = Seq((7L, 0L, 98L)) // spans 25 buckets at w=4
    val got = run(points, ivs, w = 4)
    assert(got == points.map { case (pid, _) => (pid, 7L) })
  }

  test("empty interval (hi < lo) matches nothing; zero-span matches its point") {
    val points = Seq((1L, 5L), (2L, 6L))
    assert(run(points, Seq((9L, 6L, 4L)), w = 3).isEmpty)
    assert(run(points, Seq((9L, 5L, 5L)), w = 3) == Seq((1L, 9L)))
  }

  test("over-wide interval fails fast with the expansion error") {
    import spark.implicits._
    val p = Seq((1L, 5L)).toDF("pid", "t")
    val i = Seq((1L, 0L, 1000000L)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(p, "t", i, "lo", "hi",
        bucketWidth = 2, maxBucketsPerInterval = 100).collect()
    }
    assert(e.getMessage.contains("spans more than 100 buckets"),
      e.getMessage)
  }

  test("plan is an equi-join on the bucket id — no nested loop, no cartesian") {
    import spark.implicits._
    val p = spark.range(100000).select(col("id").as("pid"), (col("id") % 9973).as("t"))
    val i = spark.range(5000).select(col("id").as("iid"),
      (col("id") % 997).as("lo"), (col("id") % 997 + 10).as("hi"))
    val joined = RangeJoin.pointInInterval(p, "t", i, "lo", "hi", bucketWidth = 8)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must not plan a nested loop:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi-join on the bucket key:\n$plan")
  }
}
