package graft

import org.apache.spark.sql.functions._

import operators.{DriftOps, TfIdf}

/** KS drift probes + corpus-statistics scoring (BM25 / TF-IDF / entropy). */
class DriftTfIdfSpec extends SparkTestBase {

  import spark.implicits._

  // --- datasketch_*_ks scalars ------------------------------------------

  test("kll_ks: identical distributions ~0, disjoint distributions ~1") {
    val df = spark.range(10000).select(
      (col("id") % 1000).cast("double").as("v"),
      ((col("id") % 1000) + 5000.0).as("w"))
    val r = df.agg(
      expr("datasketch_kll(200, v)").as("a"),
      expr("datasketch_kll(200, v)").as("b"),
      expr("datasketch_kll(200, w)").as("c"))
      .selectExpr(
        "datasketch_kll_ks(a, b) AS same",
        "datasketch_kll_ks(a, c) AS disjoint",
        "datasketch_kll_ks_test(a, b, 0.05) AS same_reject",
        "datasketch_kll_ks_test(a, c, 0.05) AS disjoint_reject")
      .head()
    assert(r.getDouble(0) == 0.0)
    assert(r.getDouble(1) > 0.99)
    assert(!r.getBoolean(2) && r.getBoolean(3))
  }

  test("kll_ks: sketch delta within summed rank error of the exact delta") {
    // two overlapping uniform slabs: exact KS is closed-form 0.5
    val df = spark.range(20000).select(
      when(col("id") < 10000, col("id") % 1000)
        .otherwise(col("id") % 2000).cast("double").as("v"),
      (col("id") < 10000).as("is_a"))
    val sk = DriftOps.sketchKs(df, "v", col("is_a"), k = 200).head()
    val exact = DriftOps.exactKs(df, "v", col("is_a")).head().getDouble(0)
    assert(math.abs(exact - 0.5) < 1e-9)
    assert(math.abs(sk.getDouble(0) - exact) <= sk.getDouble(1),
      s"sketch ${sk.getDouble(0)} vs exact $exact outside eps ${sk.getDouble(1)}")
  }

  test("kll_ks: float lane dispatches via metadata; empty side → NULL") {
    val r = spark.range(1000)
      .select(col("id").cast("float").as("v"), lit(null).cast("float").as("nv"))
      .agg(expr("datasketch_kll(200, v)").as("a"),
        expr("datasketch_kll(200, nv)").as("e"))
      .selectExpr("datasketch_kll_ks(a, a) AS same", "datasketch_kll_ks(a, e) AS vs_empty")
      .head()
    assert(r.getDouble(0) == 0.0 && r.isNullAt(1))
  }

  test("quantiles_ks works on the classic double sketch; long lane bind-errors") {
    val r = spark.range(5000).select(col("id").cast("double").as("v"))
      .agg(expr("datasketch_quantiles(128, v)").as("a"))
      .selectExpr("datasketch_quantiles_ks(a, a) AS same").head()
    assert(r.getDouble(0) == 0.0)
    val err = intercept[Exception] {
      spark.range(10).select(col("id").as("v"))
        .agg(expr("datasketch_kll(200, v)").as("a"))
        .selectExpr("datasketch_kll_ks(a, a)").collect()
    }
    assert(err.getMessage.contains("double and float KLL lanes"))
  }

  test("identical distributions: sketch KS ≡ exact KS exactly (ties included)") {
    // the library's merge-walk evaluates CDF differences at sorted-view
    // frontier pairs — off the textbook sup by up to one combined ECDF
    // step on differing distributions (the q94 band), but exactly 0 ≡ 0
    // when the two distributions coincide
    val df = spark.range(300).select(
      ((col("id") % 60) / 4.0).as("v"), (col("id") % 2 === 0).as("is_a"))
    val sk = DriftOps.sketchKs(df, "v", col("is_a"), k = 200).head().getDouble(0)
    val ex = DriftOps.exactKs(df, "v", col("is_a")).head().getDouble(0)
    assert(sk == ex, s"sketch $sk != exact $ex on identical slices")
  }

  test("ksSeries: every pair's sketch KS lands inside its band") {
    val ev = normalizeEventTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val r = DriftOps.ksSeries(ev, "ts", "value", k = 200)
      .select((abs(col("ks_sketch") - col("ks_exact")) <= col("eps")).as("ok"),
        col("ks_exact"))
      .collect()
    assert(r.nonEmpty && r.forall(_.getBoolean(0)))
    assert(r.forall(x => x.getDouble(1) >= 0 && x.getDouble(1) <= 1))
  }

  test("ks scalars surface the family deserialization error on corrupt blobs") {
    val err = intercept[Exception] {
      spark.sql("SELECT datasketch_kll_ks(CAST('garbage' AS BINARY), " +
        "CAST('garbage' AS BINARY))").collect()
    }
    val msg = err.getMessage + Option(err.getCause).map(_.getMessage).getOrElse("")
    assert(msg.toLowerCase.contains("deserialize"), s"unexpected error: $msg")
  }

  test("exactKs two-level scan ≡ single-window formulation, ties included") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(3000).select(
      (col("id") % 97).cast("double").as("v"), (col("id") % 3 === 0).as("is_a"))
    val fast = DriftOps.exactKs(df, "v", col("is_a")).head().getDouble(0)
    // reference: global RANGE window over raw rows (ties collapse exactly)
    val raw = df.select(col("v"), when(col("is_a"), 1L).otherwise(0L).as("ia"))
    val na = raw.agg(sum("ia")).head().getLong(0).toDouble
    val nb = raw.count() - na
    val w = Window.orderBy("v")
    val slow = raw
      .withColumn("ca", sum("ia").over(w))
      .withColumn("cb", sum(lit(1L) - col("ia")).over(w))
      .agg(max(abs(col("ca") / na - col("cb") / nb))).head().getDouble(0)
    assert(fast == slow)
  }

  test("req_ks: float-native delta works; _ks_test bind-errors (relative error)") {
    val r = spark.range(5000).select(col("id").cast("double").as("v"))
      .agg(expr("datasketch_req(12, v)").as("a"))
      .selectExpr("datasketch_req_ks(a, a) AS same").head()
    assert(r.getDouble(0) == 0.0)
    val err = intercept[Exception] {
      spark.range(10).select(col("id").cast("double").as("v"))
        .agg(expr("datasketch_req(12, v)").as("a"))
        .selectExpr("datasketch_req_ks_test(a, a, 0.05)").collect()
    }
    assert(err.getMessage.contains("relative"))
  }

  test("psi: identical slices ~0, shifted slices large, sketch tracks exact") {
    // same uniform distribution in both slices → exact PSI 0
    val same = spark.range(20000).select(
      (col("id") % 1000).cast("double").as("v"), (col("id") % 2 === 0).as("is_a"))
    val e0 = DriftOps.exactPsi(same, "v", col("is_a")).head().getDouble(0)
    assert(math.abs(e0) < 1e-12)
    val s0 = DriftOps.sketchPsi(same, "v", col("is_a")).head().getDouble(0)
    assert(math.abs(s0 - e0) <= 0.05)
    // disjoint slabs → every bin one-sided: PSI = 2 · Σ p·ln(p/1e-4), large
    val shifted = spark.range(20000).select(
      when(col("id") % 2 === 0, col("id") % 1000)
        .otherwise((col("id") % 1000) + 10000).cast("double").as("v"),
      (col("id") % 2 === 0).as("is_a"))
    val e1 = DriftOps.exactPsi(shifted, "v", col("is_a")).head().getDouble(0)
    assert(e1 > 5.0)
    val s1 = DriftOps.sketchPsi(shifted, "v", col("is_a")).head().getDouble(0)
    assert(math.abs(s1 - e1) <= 0.5, s"sketch PSI $s1 vs exact $e1")
    // constant column: all split points coincide — defined as PSI 0
    val const = spark.range(100).select(lit(7.0).as("v"), (col("id") % 2 === 0).as("is_a"))
    assert(DriftOps.sketchPsi(const, "v", col("is_a")).head().getDouble(0) == 0.0)
    assert(DriftOps.exactPsi(const, "v", col("is_a")).head().getDouble(0) == 0.0)
  }

  test("rankTransform: ranks in (0,1], monotone with value, near-exact") {
    val df = spark.range(5000).select((col("id") % 997).cast("double").as("v"))
    val r = operators.RangeBounds.rankTransform(df, "v", "r", kllK = 400)
      .collect().map(x => (x.getDouble(0), x.getDouble(1)))
    assert(r.forall { case (_, rk) => rk > 0.0 && rk <= 1.0 })
    val nre = org.apache.datasketches.kll.KllSketch.getNormalizedRankError(400, false)
    // exact inclusive rank of v in id%997 over 5000 rows is closed-form
    val counts = r.map(_._1).groupBy(identity).view.mapValues(_.size).toMap
    val sortedVals = counts.keys.toSeq.sorted
    val cum = sortedVals.scanLeft(0)((a, v) => a + counts(v)).tail
    val exact = sortedVals.zip(cum.map(_ / 5000.0)).toMap
    assert(r.forall { case (v, rk) => math.abs(rk - exact(v)) <= 2 * nre })
  }

  test("crossMinhashPairs ≡ self-join pairs restricted to the split") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cross = operators.DedupOps.crossMinhashPairs(
        docs.filter(col("doc_id") % 5 === 0), docs.filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text", k = 3, threshold = 0.6)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: the within-corpus miner (a<b canonical), re-oriented
    val self = operators.DedupOps.minhashLshPairs(docs, "doc_id", "text",
        k = 3, threshold = 0.6)
      .select(col("doc_a"), col("doc_b")).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .filter { case (a, b) => a % 5 == 0 && b % 5 != 0 }.toSet
    assert(cross == self, s"cross=${cross.size} self=${self.size}")
  }

  // --- termCounts / entropy ---------------------------------------------

  test("termRuns: native runs match hand counts, empty → empty") {
    val df = Seq("b a B c a b", "x", "", "   ").toDF("text")
      .select(TfIdf.termRuns(col("text")).as("tc"))
    val rows = df.selectExpr("to_json(tc) AS j").as[String].collect()
    assert(rows(0) == """[{"term":"a","tf":2},{"term":"b","tf":3},{"term":"c","tf":1}]""")
    assert(rows(1) == """[{"term":"x","tf":1}]""")
    assert(rows(2) == "[]" && rows(3) == "[]")
  }

  test("termRuns ≡ the composed array-ops reference on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    val both = docs.select(
      TfIdf.termRuns(col("text")).as("fast"),
      TfIdf.termCountsArrayOps(TfIdf.lowerTokens(col("text"))).as("ref"))
    assert(both.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("tokenEntropy: uniform = ln(k), constant = 0, empty = NULL") {
    val r = Seq("a b c d", "same same same", "", "lone").toDF("text")
      .select(TfIdf.tokenEntropy(col("text")).as("h")).collect()
    assert(math.abs(r(0).getDouble(0) - math.log(4)) < 1e-12)
    assert(r(1).getDouble(0) == 0.0)
    assert(r(2).isNullAt(0))
    assert(r(3).getDouble(0) == 0.0)
  }

  // --- BM25 / TF-IDF -----------------------------------------------------

  test("bm25: hand-checked two-doc corpus") {
    val docs = Seq((1L, "apple banana apple"), (2L, "banana cherry"),
      (3L, "durian")).toDF("doc_id", "text")
    val out = TfIdf.bm25(docs, "doc_id", "text", query = Seq("apple"), topK = 10)
      .collect()
    // only doc 1 contains 'apple'
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    val k1 = 1.2; val b = 0.75
    val idf = math.log(1.0 + (3 - 1 + 0.5) / (1 + 0.5)) // N=3, df=1
    val tf = 2.0; val dl = 3.0; val avgdl = (3 + 2 + 1) / 3.0
    val expected = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    assert(out.head.getLong(2) == math.floor(expected * 1e6).toLong)
  }

  test("tfidf top terms: rare term beats frequent term") {
    val docs = Seq((1L, "common common rare"), (2L, "common x"),
      (3L, "common y")).toDF("doc_id", "text")
    val top = TfIdf.tfidfTopTerms(docs, "doc_id", "text")
      .orderBy("id").collect()
    // 'common' has df=3 → idf=ln(1)=0; doc 1's salient term is 'rare'
    assert(top.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "rare"), (2L, "x"), (3L, "y")))
  }

  test("bm25: empty or all-blank corpus returns an empty frame, no crash") {
    val docs = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    assert(TfIdf.bm25(docs, "doc_id", "text", query = Seq("x")).count() == 0)
    assert(TfIdf.bm25(docs.limit(0), "doc_id", "text", query = Seq("x")).count() == 0)
  }

  test("bm25 rejects an unbounded query-term set") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    val err = intercept[IllegalArgumentException] {
      TfIdf.bm25(docs, "doc_id", "text", query = (1 to 2000).map("t" + _))
    }
    assert(err.getMessage.contains("broadcast-bounded"))
  }
}
