package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{GraftRuntime, ZOrder}

/** Morton key correctness, error paths, and the locality property that
  * justifies the layout: z-ordered partitions are narrow in EVERY
  * participating dimension, single-column sort only in its own. */
class ZOrderSpec extends SparkTestBase {

  private val rnd = new Random(111)

  /** Reference interleave: walk bits, place bit j of dim i at j*dims+i. */
  private def refKey(bits: Int, vs: Seq[Long]): Long = {
    var key = 0L
    for (i <- vs.indices; j <- 0 until bits)
      key |= ((vs(i) >>> j) & 1L) << (j * vs.size + i)
    key
  }

  test("matches the reference interleave for dims 2-4, random values") {
    for (_ <- 0 until 300) {
      val dims = 2 + rnd.nextInt(3)
      val bits = 1 + rnd.nextInt(63 / dims)
      val vs = Seq.fill(dims)(math.abs(rnd.nextLong()) % (1L << bits))
      assert(vs.zipWithIndex.map { case (v, i) =>
        GraftRuntime.zorderSpread(v, bits, dims, i)
      }.reduce(_ | _) == refKey(bits, vs), s"runtime bits=$bits vs=$vs")
      val cols = vs.map(v => s"${v}L").mkString(", ")
      val got = sql(s"SELECT graft_zorder($bits, $cols) AS z").collect()(0).getLong(0)
      assert(got == refKey(bits, vs), s"bits=$bits vs=$vs")
    }
  }

  test("z-order is monotone per dimension holding others fixed") {
    // raising one dim's value can only raise the key when other dims fixed
    for (_ <- 0 until 100) {
      val a1 = rnd.nextInt(256).toLong; val a2 = a1 + rnd.nextInt(256 - a1.toInt)
      val b = rnd.nextInt(256).toLong
      assert(refKey(8, Seq(a1, b)) <= refKey(8, Seq(a2, b)))
      assert(refKey(8, Seq(b, a1)) <= refKey(8, Seq(b, a2)))
    }
  }

  test("null dimension nulls the key") {
    val r = sql("SELECT graft_zorder(4, CAST(NULL AS BIGINT), 3L) AS z").collect()(0)
    assert(r.isNullAt(0))
  }

  test("out-of-range dimension value fails with the quantize hint") {
    val e = intercept[Exception] {
      sql("SELECT graft_zorder(4, 16L, 3L)").collect()
    }
    assert(e.getMessage.contains("out of [0, 16)"), e.getMessage)
  }

  test("bind errors: arity, key width, non-bigint after cast is fine") {
    val e1 = intercept[Exception] { sql("SELECT graft_zorder(4, 1L)").collect() }
    assert(e1.getMessage.contains("graft_zorder"))
    val e2 = intercept[Exception] { sql("SELECT graft_zorder(32, 1L, 1L)").collect() }
    assert(e2.getMessage.contains("63 key bits") || e2.getMessage.contains("graft_zorder"))
    // int literals cast to BIGINT at registration — must work
    assert(sql("SELECT graft_zorder(4, 5, 10) AS z").collect()(0).getLong(0) == 153L)
  }

  test("quantize clamps out-of-bounds and covers the cell range") {
    import spark.implicits._
    val df = Seq(-5.0, 0.0, 0.49, 0.5, 0.99, 1.0, 7.3).toDF("x")
    val q = df.select(ZOrder.quantize(col("x"), 0.0, 1.0, 2).as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(q == Seq(0L, 0L, 1L, 2L, 3L, 3L, 3L))
  }

  test("quantize propagates NULL and NaN (consistent with ZOrderKey), not cell 0") {
    import spark.implicits._
    val df = Seq[java.lang.Double](null, Double.NaN, 0.25).toDF("x")
    val q = df.select(ZOrder.quantize(col("x"), 0.0, 1.0, 2).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(q == Seq(None, None, Some(1L)), q.toString)
  }

  test("layoutBy partitions are narrow in BOTH dims; single-sort is not") {
    import spark.implicits._
    val n = 20000
    val df = spark.range(n).select(
      (rand(1) * 256).cast("long").as("a"),
      (rand(2) * 256).cast("long").as("b"))
    def spans(d: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val s = d.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
        .agg(avg("sa").as("ma"), avg("sb").as("mb"))
        .collect()(0)
      (s.getDouble(0), s.getDouble(1))
    }
    val (za, zb) = spans(ZOrder.layoutBy(df, 8, 16, col("a"), col("b")))
    val (sa, sb) = spans(df.repartitionByRange(16, col("a")).sortWithinPartitions("a"))
    // z-order: both dims well under the global span of 255; 16 partitions
    // ≈ 4x4 grid → per-dim span ≈ 64-ish. single-column sort: a narrow,
    // b ≈ full span.
    assert(za < 128 && zb < 128, s"z spans: $za, $zb")
    assert(sa < 32, s"sorted-dim span: $sa")
    assert(sb > 200, s"unsorted dim should stay wide: $sb")
    assert(zb < sb / 2, s"z must at least halve the unsorted dim: $zb vs $sb")
  }
}
