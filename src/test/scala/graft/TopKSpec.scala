package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{TopK, TopKByAgg}

/** Bounded top-k-per-group aggregate: heap semantics, SQL face, window
  * equivalence, and the partial-aggregation plan shape that is the whole
  * point of the operator. */
class TopKSpec extends SparkTestBase {

  private val rnd = new Random(1408)

  private def randomPairs(n: Int): List[(Double, Long)] =
    List.fill(n)((rnd.nextInt(20).toDouble / 2, rnd.nextLong() % 1000))

  // ---- heap unit + property level ----------------------------------------

  private def refTopK(k: Int, xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortBy { case (s, i) => (-s, i) }.take(k)

  test("heap keeps the k best by (score desc, id asc), any insert order") {
    for (trial <- 0 until 200) {
      val xs = randomPairs(rnd.nextInt(40))
      val k = trial % 7 + 1
      val h = new TopKByAgg.Heap(k)
      xs.foreach { case (s, i) => h.offer(s, i) }
      val (ss, ii) = h.sortedBestFirst()
      assert(ss.zip(ii).toSeq == refTopK(k, xs), s"k=$k xs=$xs")
    }
  }

  test("heap merge == union then top-k; serialize round-trips") {
    for (_ <- 0 until 200) {
      val (ca, cb) = (randomPairs(rnd.nextInt(30)), randomPairs(rnd.nextInt(30)))
      val k = 5
      val agg = TopKByAgg(k, null, null)
      val ha = new TopKByAgg.Heap(k); ca.foreach { case (s, i) => ha.offer(s, i) }
      val hb = new TopKByAgg.Heap(k); cb.foreach { case (s, i) => hb.offer(s, i) }
      val merged = agg.merge(ha, agg.deserialize(agg.serialize(hb)))
      val (ss, ii) = merged.sortedBestFirst()
      assert(ss.zip(ii).toSeq == refTopK(k, ca ++ cb), s"a=$ca b=$cb")
    }
  }

  test("NaN scores rank greatest (Spark DESC sort order) and never wedge the heap") {
    // IEEE `>` is false in both directions for NaN: a naive comparator
    // admits a NaN while the heap is underfull and then can never evict
    // it. The total order (Double.compare) ranks NaN above every finite
    // score — matching row_number() OVER (ORDER BY s DESC) in Spark —
    // and keeps eviction live after a NaN lands at the root.
    val h = new TopKByAgg.Heap(2)
    Seq((Double.NaN, 5L), (1.0, 1L), (2.0, 2L), (3.0, 3L)).foreach { case (s, i) => h.offer(s, i) }
    val (ss, ii) = h.sortedBestFirst()
    assert(ss(0).isNaN && ii(0) == 5L && ss(1) == 3.0 && ii(1) == 3L, s"${ss.toSeq} ${ii.toSeq}")
    // all-NaN then better finite values still evict down to the finite top-k
    val h2 = new TopKByAgg.Heap(2)
    Seq((Double.NaN, 1L), (Double.NaN, 2L), (Double.NaN, 3L)).foreach { case (s, i) => h2.offer(s, i) }
    val (_, ii2) = h2.sortedBestFirst()
    assert(ii2.toSeq == Seq(1L, 2L), s"NaN ties break by id: ${ii2.toSeq}")
  }

  test("ties broken by smaller id; duplicates kept distinct") {
    val h = new TopKByAgg.Heap(2)
    Seq((1.0, 9L), (1.0, 3L), (1.0, 7L), (0.5, 1L)).foreach { case (s, i) => h.offer(s, i) }
    val (ss, ii) = h.sortedBestFirst()
    assert(ss.toSeq == Seq(1.0, 1.0) && ii.toSeq == Seq(3L, 7L))
  }

  // ---- DataFrame / SQL level ---------------------------------------------

  test("perGroup equals the window row_number formulation") {
    import spark.implicits._
    val n = 2000
    val df = spark.range(n).select(
      (col("id") % 37).cast("string").as("g"),
      (hash(col("id")) % 1000).cast("double").as("s"),
      col("id").as("rid"))
    val got = TopK.perGroup(df, Seq("g"), "s", "rid", k = 4)
      .orderBy("g", "rnk").collect()
    val want = df.withColumn("rnk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy(col("s").desc, col("rid"))).cast("long"))
      .filter(col("rnk") <= 4)
      .select(col("g"), col("rnk"), col("rid").as("id"), col("s").as("score"))
      .orderBy("g", "rnk").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("SQL face graft_topk_by(k, score, id) with int inputs casts and runs") {
    import spark.implicits._
    Seq((1, 10, 100L), (1, 30, 101L), (1, 20, 102L), (2, 5, 200L))
      .toDF("g", "s", "i").createOrReplaceTempView("topk_in")
    val rows = sql(
      """SELECT g, graft_topk_by(2, s, i) AS tk FROM topk_in GROUP BY g ORDER BY g"""
    ).collect()
    val g1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(g1.map(r => (r.getDouble(0), r.getLong(1))) == Seq((30.0, 101L), (20.0, 102L)))
    assert(rows(1).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)) == Seq(200L))
  }

  test("null score or id rows are skipped, not ranked") {
    import spark.implicits._
    Seq((Some(5.0), Some(1L)), (None, Some(2L)), (Some(9.0), None), (Some(3.0), Some(4L)))
      .toDF("s", "i").createOrReplaceTempView("topk_nulls")
    val tk = sql("SELECT graft_topk_by(10, s, i) AS tk FROM topk_nulls")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(tk.map(r => (r.getDouble(0), r.getLong(1))) == Seq((5.0, 1L), (3.0, 4L)))
  }

  test("empty group yields an empty array, not null") {
    val tk = sql("SELECT graft_topk_by(3, CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT)) AS tk")
      .collect()(0)
    assert(!tk.isNullAt(0) && tk.getSeq[Any](0).isEmpty)
  }

  // ---- plan shape: the reason this operator exists -----------------------

  test("plan is partial+final ObjectHashAggregate — no Window, no full sort") {
    val df = spark.range(100000).select(
      (col("id") % 1000).as("g"), rand(7).as("s"), col("id").as("rid"))
    val grouped = df.groupBy("g").agg(TopK.topkBy(8, col("s"), col("rid")).as("tk"))
    val plan = grouped.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    val first = plan.indexOf("ObjectHashAggregate")
    assert(plan.indexOf("ObjectHashAggregate", first + 1) > 0,
      s"expected partial+final ObjectHashAggregate (map-side combine):\n$plan")
    assert(!plan.contains("Window"), s"top-k must not plan a Window:\n$plan")
  }
}
