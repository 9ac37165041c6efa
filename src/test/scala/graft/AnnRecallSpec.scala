package graft

import org.apache.spark.sql.functions._

import operators.SimilarityOps

/** ANN recall contracts on CLUSTERED embedding geometry (r15 verdict #8).
  *
  * The r14 recall map was measured on the near-random synthetic corpus —
  * the worst case for sign-bit LSH (per-plane agreement for true
  * neighbors barely above 1/2, so recall is just the probed fraction of
  * bucket space). Real corpora have neighborhood structure: semantic
  * neighbors sit at cosine 0.8–0.95, where plane agreement is 0.8–0.9
  * and MORE planes at a given probe depth stay viable. This suite
  * generates deterministic clustered fixtures (hash-seeded
  * `scala.util.Random(42)` — java.util.Random's LCG is spec-fixed, so
  * the fixture is bit-identical on every JVM) and pins the
  * planes×depth×geometry trade-off published in BASELINE.md's
  * "recall map v2".
  */
class AnnRecallSpec extends SparkTestBase {

  /** 2000 unit vectors in 20 clusters: point i = normalize(center(i%20)
    * + sigma·gaussian). sigma=0.25 → neighbor cosine ≈0.73–0.85 (topical
    * clusters); sigma=0.15 → ≈0.85–0.93 (near-dup regime). */
  private def fixture(sigma: Float) = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dim = 16; val nClusters = 20; val n = 2000
    val centers = Array.fill(nClusters) {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val nm = math.sqrt(v.map(x => x * x).sum).toFloat
      v.map(_ / nm)
    }
    (0 until n).map { i =>
      val c = centers(i % nClusters)
      val v = c.map(x => x + sigma * rnd.nextGaussian().toFloat)
      val nm = math.sqrt(v.map(x => x * x).sum).toFloat
      (i.toLong, v.map(_ / nm))
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .localCheckpoint(true)
  }

  private def recalls(sigma: Float, configs: Seq[(Int, Int)]): Map[(Int, Int), Double] = {
    val emb = fixture(sigma)
    val q = emb.filter(col("vec_id") < 10)
    val truth = SimilarityOps.cosineTopK(q, emb, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size == 30)
    configs.map { case (p, d) =>
      val hits = SimilarityOps.lshTopK(q, emb, "vec_id", "embedding",
          k = 3, planes = p, probeDepth = d)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (p, d) -> (hits & truth).size.toDouble / truth.size
    }.toMap
  }

  test("clustered geometry (sigma=0.25): published dials hold, depth monotonic") {
    val r = recalls(0.25f, Seq((4, 1), (4, 2), (6, 2), (8, 2)))
    // measured 0.767 / 1.000 / 0.833 / 0.733 (r16); floors leave margin
    assert(r((4, 2)) >= 0.9, s"planes=4 depth=2: $r")
    assert(r((6, 2)) >= 0.7, s"planes=6 depth=2: $r")
    // the headline v2 claim: 8 planes at depth 2 — 0.27–0.40 on the
    // near-random corpus (r14 map) — clears 0.6 once neighbors are real
    assert(r((8, 2)) >= 0.6, s"planes=8 depth=2: $r")
    assert(r((4, 2)) >= r((4, 1)), s"depth must not shrink recall: $r")
  }

  test("tight clusters (sigma=0.15, near-dup regime): more planes at lower depth") {
    val r = recalls(0.15f, Seq((6, 1), (8, 1), (8, 2)))
    // measured 0.833 / 0.733 / 0.933 (r16)
    assert(r((6, 1)) >= 0.7, s"planes=6 depth=1: $r")
    assert(r((8, 1)) >= 0.6, s"planes=8 depth=1: $r")
    assert(r((8, 2)) >= 0.85, s"planes=8 depth=2: $r")
  }

  /** r21 dropped the dropDuplicates on multi-probe candidate sets on a
    * uniqueness-by-construction argument (one signature per corpus row +
    * distinct XOR probe masks ⇒ each (query, neighbor) pair joins at most
    * once). This test PINS that invariant (r21 advice): with k large
    * enough that the rank cut is inert, the output IS the candidate set —
    * any duplicate candidate would surface as a repeated pair at distinct
    * ranks. Covers the in-memory path and the materialized-index path at
    * several probe depths; a future probeMasks or index-layout change
    * that reintroduces duplicates fails here, not in silent rank
    * inflation. */
  test("multi-probe candidate sets carry no duplicate (query, neighbor) pair") {
    val emb = fixture(0.25f)
    val q = emb.filter(col("vec_id") < 10)
    for (d <- Seq(1, 2, 3)) {
      val out = SimilarityOps.lshTopK(q, emb, "vec_id", "embedding",
          k = Int.MaxValue, planes = 6, probeDepth = d)
        .select("query_id", "neighbor_id").localCheckpoint(true)
      val n = out.count()
      val nDistinct = out.distinct().count()
      assert(n == nDistinct, s"lshTopK depth=$d: $n rows, $nDistinct distinct")
      assert(n > 0, s"lshTopK depth=$d produced no candidates")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_dupinv").toString
    try {
      operators.AnnIndex.build(emb, "vec_id", "embedding", dir, planes = 6)
      for (d <- Seq(1, 2)) {
        val out = operators.AnnIndex.query(spark, dir, q, "vec_id", "embedding",
            k = Int.MaxValue, planes = 6, probeDepth = d)
          .select("query_id", "neighbor_id").localCheckpoint(true)
        val n = out.count()
        val nDistinct = out.distinct().count()
        assert(n == nDistinct, s"index depth=$d: $n rows, $nDistinct distinct")
        assert(n > 0, s"index depth=$d produced no candidates")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }
}
