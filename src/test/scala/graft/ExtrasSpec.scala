package graft

import org.apache.spark.sql.functions._

/** Beyond-parity surface: theta_jaccard, profiler, pipeline SQL names. */
class ExtrasSpec extends SparkTestBase {

  test("datasketch_theta_jaccard returns [lb, estimate, ub] with exact small sets") {
    // set_a {1..5}, set_b {4..8}: J = 2/8 = 0.25 (theta.test:649-666)
    sql("SELECT explode(sequence(1,5)) AS i").createOrReplaceTempView("ja")
    sql("SELECT explode(sequence(4,8)) AS i").createOrReplaceTempView("jb")
    val r = sql(
      """SELECT datasketch_theta_jaccard(a.s, b.s) AS j
        |FROM (SELECT datasketch_theta(i) AS s FROM ja) a,
        |     (SELECT datasketch_theta(i) AS s FROM jb) b""".stripMargin)
      .head().getSeq[Double](0)
    assert(r.length == 3)
    assert(r(1) == 0.25, s"estimate should be exact 0.25, got ${r(1)}")
    assert(r(0) <= r(1) && r(1) <= r(2))
  }

  test("profiler: one-pass KLL+HLL+FreqItems per column") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val prof = operators.Profiler.profile(li,
      Seq("l_quantity", "l_returnflag", "l_suppkey")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.size == 3)
    val qty = prof("l_quantity")
    assert(qty.getDouble(1) == 50.0)          // approx_distinct exact at tiny card.
    assert(qty.getDouble(3) == 1.0 && qty.getDouble(4) == 50.0) // min/max
    val rf = prof("l_returnflag")
    assert(rf.getDouble(1) == 3.0)
    assert(rf.isNullAt(2))                    // no quantiles for strings
    assert(rf.getSeq[String](7).toSet.subsetOf(Set("A", "N", "R")))
  }

  test("pipeline functions available under SQL names") {
    val r = sql(
      """SELECT graft_token_count('the quick brown fox') AS tc,
        |       graft_lang_id('el la de que') AS lang,
        |       graft_simhash64('a b c') AS sh,
        |       graft_hamming64(graft_simhash64('a b c'), graft_simhash64('a b c')) AS hd,
        |       graft_fingerprint('A  b') = graft_fingerprint('a b') AS fp_eq,
        |       round(graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)), 9) AS cos_same
        |""".stripMargin).head()
    assert(r.getInt(0) == 4)
    assert(r.getString(1) == "es")
    assert(r.getLong(2) != 0L && r.getInt(3) == 0)
    assert(r.getBoolean(4))
    assert(r.getDouble(5) == 1.0)
    val r2 = sql(
      """SELECT graft_token_stats('the quick the fox').n_tokens AS nt,
        |       graft_token_stats('the quick the fox').stop AS st,
        |       size(graft_shingle_set('a b c d', 3)) AS sh,
        |       size(graft_minhash_sig(graft_shingle_set('a b c d', 3), 8)) AS mh
        |""".stripMargin).head()
    assert(r2.getInt(0) == 4 && r2.getInt(1) == 2)
    assert(r2.getInt(2) == 2 && r2.getInt(3) == 8)
    // SQL LSH signature ≡ the Scala operator's (shared expression)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.createOrReplaceTempView("lsh_sql_emb")
    val sqlSigs = sql(
      "SELECT vec_id, graft_lsh_signature(embedding, 12) AS s FROM lsh_sql_emb")
    val scalaSigs = emb.select(col("vec_id"),
      operators.SimilarityOps.lshSignature(col("embedding"), 12).as("s"))
    assert(sqlSigs.exceptAll(scalaSigs).count() == 0 &&
      scalaSigs.exceptAll(sqlSigs).count() == 0)
    // planes out of range is a bind error
    val e = intercept[Exception](
      sql("SELECT graft_lsh_signature(array(1.0F), 64)").queryExecution.analyzed)
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: chain(t.getCause)
    assert(chain(e).mkString(" ").contains("between 1 and 63"))
  }

  test("salted skew aggregation equals unsalted exactly (theta determinism)") {
    // heavily skewed: one key owns 90% of rows
    spark.range(0, 30000)
      .selectExpr("CASE WHEN id % 10 < 9 THEN 'hot' ELSE concat('cold_', id % 7) END AS k",
        "id % 5000 AS v")
      .createOrReplaceTempView("skewed")
    val salted = operators.Skew.saltedDistinct(spark.table("skewed"), "k", "v", salts = 16)
      .select("k", "approx_distinct").orderBy("k").collect()
    val unsalted = sql(
      """SELECT k, CAST(round(datasketch_theta_estimate(datasketch_theta(12, v))) AS BIGINT) AS d
        |FROM skewed GROUP BY k ORDER BY k""".stripMargin).collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      unsalted.map(r => (r.getString(0), r.getLong(1))).toSeq)
    // salted plan has two exchanges (salt stage + merge stage)
    val plan = operators.Skew.saltedDistinct(spark.table("skewed"), "k", "v", salts = 16)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length >= 2, plan)
  }

  test("GraftExtensions injector registers functions without explicit register()") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    // a session built with the injector resolves the names on its own
    val est = s2.sql(
      "SELECT CAST(datasketch_theta_estimate(datasketch_theta(id)) AS INT) FROM range(7)")
      .head().getInt(0)
    assert(est == 7)
  }

  test("theta_jaccard flags near-identical key sets across table halves") {
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .createOrReplaceTempView("li_j")
    val r = sql(
      """SELECT datasketch_theta_jaccard(a.s, b.s)[1] AS j
        |FROM (SELECT datasketch_theta(l_suppkey) AS s FROM li_j WHERE l_returnflag = 'A') a,
        |     (SELECT datasketch_theta(l_suppkey) AS s FROM li_j WHERE l_returnflag = 'R') b""".stripMargin)
      .head().getDouble(0)
    assert(r > 0.8, s"supplier sets of A and R halves overlap heavily, got $r")
  }
}
