package graft

/** AOD tuple-family behavioral tests (sketch.Tuple): build/merge/empty/NULL
  * semantics, value-aware set algebra, two-level union rollups, and the
  * sort-based-fallback parity pin (the buffer must survive a
  * serialize → deserialize → update/merge cycle, the ObjectHashAggregate
  * fallback path). All assertions run in the exact regime (distinct keys
  * ≤ nominal entries), where estimates and per-column sums are exact.
  */
class TupleSpec extends SparkTestBase {

  test("aod build: exact distinct keys + per-key value sums") {
    // keys 0..99, each appearing twice with values (k, 1.0) → per-key
    // sums (2k, 2.0); totals: Σ2k = 9900, Σ2.0 = 200
    spark.range(0, 200)
      .selectExpr("id % 100 AS k", "CAST(id % 100 AS DOUBLE) AS v1", "CAST(1.0 AS DOUBLE) AS v2")
      .createOrReplaceTempView("aod_t")
    val r = sql(
      """SELECT CAST(round(datasketch_aod_estimate(sk)) AS BIGINT),
        |       CAST(round(element_at(datasketch_aod_sum_estimate(sk), 1)) AS BIGINT),
        |       CAST(round(element_at(datasketch_aod_sum_estimate(sk), 2)) AS BIGINT),
        |       datasketch_aod_num_values(sk),
        |       datasketch_aod_num_retained(sk),
        |       datasketch_aod_is_empty(sk),
        |       datasketch_aod_is_estimation_mode(sk),
        |       datasketch_aod_theta(sk)
        |FROM (SELECT datasketch_aod(12, 2, k, v1, v2) AS sk FROM aod_t)""".stripMargin).head()
    assert(r.getLong(0) == 100L)
    assert(r.getLong(1) == 9900L)
    assert(r.getLong(2) == 200L)
    assert(r.getInt(3) == 2)
    assert(r.getInt(4) == 100)
    assert(!r.getBoolean(5))
    assert(!r.getBoolean(6))
    assert(r.getDouble(7) == 1.0)
  }

  test("aod bounds bracket the exact count; describe is non-empty") {
    spark.range(0, 50).selectExpr("id AS k", "CAST(1.0 AS DOUBLE) AS v")
      .createOrReplaceTempView("aod_b")
    val r = sql(
      """SELECT datasketch_aod_lower_bound(sk, 2) <= 50.0,
        |       datasketch_aod_upper_bound(sk, 2) >= 50.0,
        |       length(datasketch_aod_describe(sk)) > 0
        |FROM (SELECT datasketch_aod(12, 1, k, v) AS sk FROM aod_b)""".stripMargin).head()
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
  }

  test("aod empty input → NULL sketch; NULL key / NULL value rows skipped") {
    sql("SELECT CAST(1 AS BIGINT) AS k, CAST(1.0 AS DOUBLE) AS v WHERE false")
      .createOrReplaceTempView("aod_empty")
    assert(sql("SELECT datasketch_aod(12, 1, k, v) FROM aod_empty").head().isNullAt(0))

    sql("""SELECT * FROM VALUES (1, 10.0), (NULL, 20.0), (2, NULL), (1, 5.0)
          |t(k, v)""".stripMargin).createOrReplaceTempView("aod_nulls")
    val r = sql(
      """SELECT CAST(round(datasketch_aod_estimate(sk)) AS BIGINT),
        |       CAST(round(element_at(datasketch_aod_sum_estimate(sk), 1)) AS BIGINT)
        |FROM (SELECT datasketch_aod(12, 1, k, CAST(v AS DOUBLE)) AS sk FROM aod_nulls)""".stripMargin).head()
    // keys {1, 2-with-null-value-skipped} → only key 1 (10+5) and nothing else
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 15L)
  }

  test("aod update semantics: repeated key sums the value vector") {
    sql("SELECT * FROM VALUES ('a', 1.0), ('a', 2.0), ('b', 4.0) t(k, v)")
      .createOrReplaceTempView("aod_rep")
    val r = sql(
      """SELECT CAST(round(datasketch_aod_estimate(sk)) AS BIGINT),
        |       round(element_at(datasketch_aod_sum_estimate(sk), 1), 6)
        |FROM (SELECT datasketch_aod(12, 1, k, CAST(v AS DOUBLE)) AS sk FROM aod_rep)""".stripMargin).head()
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(1) == 7.0)
  }

  test("aod intersect sums values of common keys; a_not_b keeps A's values") {
    // A: keys 0..99 value 1 each; B: keys 50..149 value 2 each.
    // intersect → keys 50..99 (50 keys), per-key sum 3 → Σ = 150
    // a_not_b   → keys 0..49  (50 keys), per-key sum 1 → Σ = 50
    spark.range(0, 100).selectExpr("id AS k", "CAST(1.0 AS DOUBLE) AS v")
      .createOrReplaceTempView("aod_a")
    spark.range(50, 150).selectExpr("id AS k", "CAST(2.0 AS DOUBLE) AS v")
      .createOrReplaceTempView("aod_setb")
    val r = sql(
      """WITH a AS (SELECT datasketch_aod(12, 1, k, v) AS s FROM aod_a),
        |     b AS (SELECT datasketch_aod(12, 1, k, v) AS s FROM aod_setb)
        |SELECT CAST(round(datasketch_aod_estimate(datasketch_aod_intersect(a.s, b.s))) AS BIGINT),
        |       CAST(round(element_at(datasketch_aod_sum_estimate(datasketch_aod_intersect(a.s, b.s)), 1)) AS BIGINT),
        |       CAST(round(datasketch_aod_estimate(datasketch_aod_a_not_b(a.s, b.s))) AS BIGINT),
        |       CAST(round(element_at(datasketch_aod_sum_estimate(datasketch_aod_a_not_b(a.s, b.s)), 1)) AS BIGINT)
        |FROM a, b""".stripMargin).head()
    assert(r.getLong(0) == 50L)
    assert(r.getLong(1) == 150L)
    assert(r.getLong(2) == 50L)
    assert(r.getLong(3) == 50L)
  }

  test("aod two-level union rollup preserves keys and sums") {
    // group by k%4, build per-group sketches, union the BLOBs back up:
    // keys 0..199 value 1 each → estimate 200, Σ = 200
    spark.range(0, 200).selectExpr("id AS k", "id % 4 AS g", "CAST(1.0 AS DOUBLE) AS v")
      .createOrReplaceTempView("aod_roll")
    val r = sql(
      """SELECT CAST(round(datasketch_aod_estimate(m)) AS BIGINT),
        |       CAST(round(element_at(datasketch_aod_sum_estimate(m), 1)) AS BIGINT)
        |FROM (SELECT datasketch_aod_union(12, sk) AS m
        |      FROM (SELECT g, datasketch_aod(12, 1, k, v) AS sk
        |            FROM aod_roll GROUP BY g))""".stripMargin).head()
    assert(r.getLong(0) == 200L)
    assert(r.getLong(1) == 200L)
  }

  test("aod union of zero rows / all-NULL blobs → NULL") {
    sql("SELECT CAST(NULL AS BINARY) AS sk FROM range(3)")
      .createOrReplaceTempView("aod_null_blobs")
    assert(sql("SELECT datasketch_aod_union(12, sk) FROM aod_null_blobs").head().isNullAt(0))
  }

  test("aod grouped sort-based fallback ≡ hash path (serialize/update cycle)") {
    // Force ObjectHashAggregate's sort-based fallback (threshold 2) on a
    // grouped build; the buffer crosses serialize → deserialize → further
    // raw updates and merges. Must equal the pure hash-path result — this
    // is the pin for the former updatable-cast CCE (Tuple.scala buffer).
    spark.range(0, 20000)
      .selectExpr("id % 499 AS g", "id % 1000 AS k", "CAST(1.0 AS DOUBLE) AS v")
      .createOrReplaceTempView("aod_fb")
    def run(): Seq[org.apache.spark.sql.Row] = sql(
      """SELECT g, CAST(round(datasketch_aod_estimate(sk)) AS BIGINT) AS est,
        |       CAST(round(element_at(datasketch_aod_sum_estimate(sk), 1)) AS BIGINT) AS total
        |FROM (SELECT g, datasketch_aod(12, 1, k, v) AS sk FROM aod_fb GROUP BY g)
        |ORDER BY g""".stripMargin).collect().toSeq
    val orig = spark.conf.get("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    val hash = run()
    try {
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2")
      val sorted = run()
      assert(hash == sorted, "aod sort-based fallback must equal the hash path")
    } finally spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", orig)
    // sanity on the values themselves: every group holds ~40 rows of
    // distinct keys (20000/499 rows, all distinct k within a group)
    assert(hash.map(_.getLong(2)).sum == 20000L)
  }

  test("sampling + bloom grouped sort-based fallback ≡ hash path") {
    // same serialize → deserialize → update cycle pin as the aod test,
    // for the other beyond-reference families with object buffers
    spark.range(0, 20000)
      .selectExpr("id % 499 AS g", "CAST(id + 1 AS DOUBLE) AS v", "id AS k")
      .createOrReplaceTempView("sb_fb")
    def run(): Seq[org.apache.spark.sql.Row] = sql(
      """SELECT g, datasketch_reservoir_n(datasketch_reservoir(16, v)) AS rn,
        |       CAST(round(aggregate(datasketch_varopt_samples(
        |         datasketch_varopt(1024, k, v), 'long'), CAST(0.0 AS DOUBLE),
        |         (acc, x) -> acc + x.weight)) AS BIGINT) AS vw,
        |       datasketch_bloom_might_contain(datasketch_bloom(1024, 0.01, k), g) AS bm
        |FROM sb_fb GROUP BY g ORDER BY g""".stripMargin).collect().toSeq
    val orig = spark.conf.get("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    val hash = run()
    try {
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2")
      assert(hash == run(), "sampling/bloom sort-based fallback must equal the hash path")
    } finally spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", orig)
  }

  test("aod bind errors: arity, lg_k range, num_values mismatch, non-BLOB union") {
    val e1 = intercept[Exception](sql("SELECT datasketch_aod(12, 1)"))
    assert(e1.getMessage.contains("expected (lg_k, num_values, key, v1, ...)"))
    val e2 = intercept[Exception](
      sql("SELECT datasketch_aod(99, 1, k, v) FROM (SELECT 1 k, 1.0 v)"))
    assert(e2.getMessage.contains("lg_k"))
    val e3 = intercept[Exception](
      sql("SELECT datasketch_aod(12, 2, k, v) FROM (SELECT 1 k, 1.0 v)"))
    assert(e3.getMessage.contains("value columns"))
    val e4 = intercept[Exception](
      sql("SELECT datasketch_aod_union(12, k) FROM (SELECT 1 k)"))
    assert(e4.getMessage.contains("BLOB"))
  }

  test("aod corrupt blob → Failed to deserialize error") {
    val e = intercept[Exception](
      sql("SELECT datasketch_aod_estimate(CAST('garbage!' AS BINARY))").collect())
    assert(e.getMessage.contains("Failed to deserialize") ||
      (e.getCause != null && e.getCause.getMessage.contains("Failed to deserialize")))
  }
}
