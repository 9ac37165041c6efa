package graft

import org.apache.spark.sql.functions._

import operators._

/** Round-3 operators: bloom-filter join pruning, as-of join, KLL-driven
  * range partitioning. */
class Round3Spec extends SparkTestBase {

  // NOT cached: suites share the session, and a cached lineitem would make
  // PlanSpec's pushdown assertions resolve to an InMemoryRelation.
  private lazy val lineitem =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
  private lazy val supplier =
    spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")

  private lazy val events = {
    // Older corpora: ts is TIMESTAMP(NANOS) parquet → nano-long under this
    // flag; newer ones are native timestamp[us]. Helper handles both.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
  }

  // ---- bloom --------------------------------------------------------------

  test("bloom filter: no false negatives, bounded false positives") {
    val sk = lineitem.agg(
      call_function("datasketch_bloom", lit(10000), lit(0.01), col("l_suppkey")).as("f"))
    val keys = lineitem.select(col("l_suppkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    val blob = sk.head().getAs[Array[Byte]](0)
    val f = graft.sketch.Bloom.wrap(blob)
    // every inserted key must be found (bloom guarantee)
    assert(keys.forall(k => f.query(k)))
    // false-positive rate over a disjoint probe range stays near fpp
    val probes = (1000000L until 1010000L)
    val fp = probes.count(k => f.query(k))
    assert(fp < probes.size * 0.05, s"false-positive count $fp out of ${probes.size}")
  }

  test("bloom build distributes: grouped partials union to the full filter") {
    Registration.register(spark)
    val whole = sql(
      """SELECT datasketch_bloom(10000, 0.01, l_suppkey) AS f
        |FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`""".stripMargin)
      .head().getAs[Array[Byte]](0)
    val unioned = sql(
      """SELECT datasketch_bloom_union(f) AS f FROM (
        |  SELECT datasketch_bloom(10000, 0.01, l_suppkey) AS f
        |  FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`
        |  GROUP BY l_returnflag)""".stripMargin)
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(whole, unioned),
      "two-level bloom union must equal the single-pass filter (deterministic OR of bits)")
  }

  test("bloom scalar metadata and SQL probe path") {
    Registration.register(spark)
    val r = sql(
      """SELECT datasketch_bloom_might_contain(f, 1) AS has1,
        |       datasketch_bloom_might_contain(f, 'nope') IS NOT NULL AS str_ok,
        |       datasketch_bloom_is_empty(f) AS empty,
        |       datasketch_bloom_num_hashes(f) > 0 AS hashes_ok,
        |       datasketch_bloom_bits_used(f) > 0 AS bits_ok,
        |       datasketch_bloom_fill_percentage(f) > 0.0 AS fill_ok
        |FROM (SELECT datasketch_bloom(100, 0.01, v) AS f
        |      FROM VALUES (1), (2), (3) t(v))""".stripMargin).head()
    assert(r.getBoolean(0) && r.getBoolean(1) && !r.getBoolean(2)
      && r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5))
    // empty input → empty filter that contains nothing
    val e = sql(
      """SELECT datasketch_bloom_is_empty(f) AS empty,
        |       datasketch_bloom_might_contain(f, 42) AS has42
        |FROM (SELECT datasketch_bloom(100, 0.01, v) AS f
        |      FROM (SELECT CAST(NULL AS INT) v WHERE false))""".stripMargin).head()
    assert(e.getBoolean(0) && !e.getBoolean(1))
  }

  test("bloom bind errors: non-constant / out-of-range parameters") {
    Registration.register(spark)
    val bad1 = intercept[Exception](sql(
      "SELECT datasketch_bloom(0, 0.01, 5)").collect())
    assert(bad1.getMessage.contains("max_distinct"))
    val bad2 = intercept[Exception](sql(
      "SELECT datasketch_bloom(100, 1.5, 5)").collect())
    assert(bad2.getMessage.contains("fpp"))
    val bad3 = intercept[Exception](sql(
      "SELECT datasketch_bloom(l_suppkey, 0.01, 5) FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`").collect())
    assert(bad3.getMessage.contains("constant"))
  }

  test("bloomPrunedJoin returns exactly the plain join result") {
    val dim = supplier.filter(col("s_nationkey") === 3)
    val plain = lineitem.join(dim, col("l_suppkey") === dim("s_suppkey"))
      .select("l_orderkey", "l_linenumber", "s_suppkey")
    val pruned = BloomPrune.bloomPrunedJoin(lineitem, "l_suppkey", dim, "s_suppkey",
        maxDistinct = 10000, fpp = 0.01)
      .select("l_orderkey", "l_linenumber", "s_suppkey")
    assert(pruned.exceptAll(plain).count() == 0 && plain.exceptAll(pruned).count() == 0)
  }

  test("bloom prune plan: probe is a plain scan filter, no join, no shuffle") {
    val dim = supplier.filter(col("s_nationkey") === 3)
    val plan = BloomPrune.bloomFilterFact(lineitem, "l_suppkey", dim, "s_suppkey")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"prune must be a scan-stage filter:\n$plan")
    assert(plan.contains("datasketch_bloom_might_contain"), s"probe missing:\n$plan")
  }

  // ---- as-of join ---------------------------------------------------------

  /** Brute-force reference: range join + keep the latest right per left. */
  private def asofBrute(left: org.apache.spark.sql.DataFrame,
                        right: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_id").orderBy(col("r_ts").desc)
    left.join(right.select(col("user_id").as("r_uid"), col("ts").as("r_ts"),
        col("value").as("r_value")),
        col("user_id") === col("r_uid") && col("r_ts") <= col("ts"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 || col("r_ts").isNull)
      .select(col("event_id"), col("r_ts"), col("r_value"))
  }

  test("asofJoin matches the brute-force range-join formulation") {
    val clicks = events.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val views = events.filter(col("event_type") === "view")
      .select("user_id", "ts", "value")
    val fast = AsOfJoin.asofJoin(clicks, views, "user_id", "ts", Seq("value"))
      .select(col("event_id"), col("ts_right").as("r_ts"), col("value").as("r_value"))
    val ref = asofBrute(clicks, views)
    assert(fast.exceptAll(ref).count() == 0 && ref.exceptAll(fast).count() == 0)
    // sanity: some matched, some unmatched rows exist in the fixture
    val matched = fast.filter(col("r_value").isNotNull).count()
    assert(matched > 0 && matched < fast.count())
  }

  test("asofJoin tie is inclusive and tolerance nulls out stale matches") {
    val l = sql("""SELECT * FROM VALUES (1L, 10L, 100L), (2L, 20L, 200L), (3L, 99L, 300L)
                  | t(k, t, lv)""".stripMargin)
    val r = sql("""SELECT * FROM VALUES (1L, 10L, 'exact'), (2L, 5L, 'older'), (3L, 1L, 'stale')
                  | t(k, t, rv)""".stripMargin)
    val out = AsOfJoin.asofJoin(l, r, "k", "t", Seq("rv"), toleranceMs = Some(50L))
      .orderBy("k").collect()
    assert(out(0).getAs[String]("rv") == "exact")  // equal timestamps match
    assert(out(1).getAs[String]("rv") == "older")  // within tolerance
    assert(out(2).isNullAt(out(2).fieldIndex("rv"))) // 98 units back > 50 → null
  }

  test("asofJoin plan: one shuffle, no join operator") {
    val clicks = events.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val views = events.filter(col("event_type") === "view")
      .select("user_id", "ts", "value")
    val plan = AsOfJoin.asofJoin(clicks, views, "user_id", "ts", Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of join must not plan a join:\n$plan")
    assert(plan.contains("Window"), s"expected window operator:\n$plan")
  }

  // ---- sampling -----------------------------------------------------------

  test("reservoir: k >= n keeps the whole input (exact mode), merge included") {
    Registration.register(spark)
    val expected = lineitem.filter(col("l_partkey") % 64 === 0)
      .select("l_extendedprice").collect().map(_.getDouble(0)).sorted.toSeq
    // single-pass build
    val direct = sql(
      """SELECT sort_array(datasketch_reservoir_samples(
        |         datasketch_reservoir(131072, l_extendedprice), 'double')) AS s
        |FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`
        |WHERE l_partkey % 64 = 0""".stripMargin)
      .head().getSeq[Double](0)
    assert(direct == expected)
    // two-level: per-group reservoirs merged through the BLOB path
    val merged = sql(
      """SELECT sort_array(datasketch_reservoir_samples(
        |         datasketch_reservoir(131072, sk, 'double'), 'double')) AS s
        |FROM (SELECT l_returnflag, datasketch_reservoir(131072, l_extendedprice) AS sk
        |      FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`
        |      WHERE l_partkey % 64 = 0 GROUP BY l_returnflag)""".stripMargin)
      .head().getSeq[Double](0)
    assert(merged == expected)
  }

  test("reservoir: k < n yields exactly k items, all drawn from the input") {
    Registration.register(spark)
    val r = sql(
      """SELECT datasketch_reservoir_num_samples(sk, 'long') AS ns,
        |       datasketch_reservoir_n(sk, 'long') AS n,
        |       datasketch_reservoir_samples(sk, 'long') AS s
        |FROM (SELECT datasketch_reservoir(50, l_suppkey) AS sk
        |      FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`)""".stripMargin)
      .head()
    val universe = lineitem.select("l_suppkey").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(r.getInt(0) == 50 && r.getLong(1) == lineitem.count())
    assert(r.getSeq[Long](2).forall(universe.contains))
    // empty input → NULL, NULLs skipped
    val e = sql(
      """SELECT datasketch_reservoir(10, v) IS NULL AS isnull,
        |       datasketch_reservoir_n(datasketch_reservoir(10, w), 'long') AS n
        |FROM VALUES (CAST(NULL AS BIGINT), 1L), (NULL, NULL), (NULL, 2L) t(v, w)""".stripMargin).head()
    assert(e.getBoolean(0) && e.getLong(1) == 2L)
  }

  test("varopt: exact mode keeps all items with true weights; total weight preserved under sampling") {
    Registration.register(spark)
    val exact = sql(
      """SELECT sort_array(datasketch_varopt_samples(
        |         datasketch_varopt(1000, v, w), 'string')) AS s
        |FROM VALUES ('a', 1.0), ('b', 2.5), ('c', 10.0) t(v, w)""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(exact.map(r => (r.getString(0), r.getDouble(1))) ==
      Seq(("a", 1.0), ("b", 2.5), ("c", 10.0)))
    // k < n: VarOpt preserves the stream's total weight in the adjusted
    // weights (the unbiasedness invariant), and keeps exactly k items
    val sampled = sql(
      """SELECT datasketch_varopt_num_samples(sk, 'long') AS ns,
        |       aggregate(datasketch_varopt_samples(sk, 'long'),
        |                 CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.weight) AS total_w
        |FROM (SELECT datasketch_varopt(64, l_suppkey, l_quantity) AS sk
        |      FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`)""".stripMargin)
      .head()
    val trueTotal = lineitem.agg(sum("l_quantity")).head().getDouble(0)
    assert(sampled.getInt(0) == 64)
    assert(math.abs(sampled.getDouble(1) - trueTotal) / trueTotal < 1e-9)
  }

  // ---- join stats ---------------------------------------------------------

  test("join-key overlap: exact-mode theta matches set arithmetic") {
    val li = lineitem // sf0.001 has suppliers 1..10
    val a = li.filter(col("l_suppkey") <= 7).select("l_suppkey")
    val b = li.filter(col("l_suppkey") > 4).select("l_suppkey")
    val r = JoinStats.keyOverlap(a, "l_suppkey", b, "l_suppkey", lgK = 14).head()
    val da = a.distinct().count().toDouble
    val db = b.distinct().count().toDouble
    val ov = a.intersect(b).count().toDouble
    assert(da > 0 && db > 0 && ov > 0, s"fixture assumption broken: $da/$db/$ov")
    assert(math.round(r.getDouble(0)) == da && math.round(r.getDouble(1)) == db)
    assert(math.round(r.getDouble(2)) == ov)
    assert(math.abs(r.getAs[Double]("containment_a") - ov / da) < 1e-9)
    // an empty side yields NULL ratios, not an ANSI divide error
    val empty = JoinStats.keyOverlap(
      a.filter(col("l_suppkey") < 0), "l_suppkey", b, "l_suppkey", lgK = 14).head()
    assert(empty.isNullAt(empty.fieldIndex("containment_a")))
  }

  // ---- range bounds -------------------------------------------------------

  test("range bounds: exact-mode cut points equal exact quantiles") {
    // n=606 values ≤ K=8192 → KLL is in exact mode → bounds are exact
    // inclusive order statistics
    val src = lineitem.filter(col("l_partkey") % 16 === 0)
    val bounds = RangeBounds.fromColumn(src, "l_extendedprice", 4, kllK = 8192)
    val exact = src.select(col("l_extendedprice").cast("double").as("v"))
      .withColumn("cd", cume_dist().over(
        org.apache.spark.sql.expressions.Window.orderBy("v")))
    val expected = Seq(0.25, 0.5, 0.75).map(r =>
      exact.filter(col("cd") >= r).agg(min("v")).head().getDouble(0))
    assert(bounds.toSeq == expected)
  }

  test("repartitionByBounds yields contiguous sorted ranges of expected size") {
    val bounds = RangeBounds.fromColumn(lineitem, "l_extendedprice", 8, kllK = 400)
    assert(bounds.toSeq == bounds.sorted.toSeq)
    val parts = RangeBounds
      .repartitionByBounds(lineitem.select(col("l_extendedprice").cast("double").as("v")), "v", bounds)
      .rdd.mapPartitions { it =>
        val vs = it.map(_.getDouble(0)).toArray
        if (vs.isEmpty) Iterator.empty
        else Iterator((vs.head, vs.last, vs.length, vs.sameElements(vs.sorted)))
      }.collect()
    // each non-empty partition is internally sorted
    assert(parts.forall(_._4))
    // partitions do not overlap in value range
    val sorted = parts.sortBy(_._1)
    assert(sorted.sliding(2).forall {
      case Array((_, amax, _, _), (bmin, _, _, _)) => amax <= bmin
      case _ => true
    })
    // balance: with K=400 the largest bucket stays well under 2× the ideal
    val n = lineitem.count().toDouble
    assert(parts.map(_._3).max < n / (bounds.length + 1) * 2)
  }
}
