package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Weighted (multiset) Jaccard pairs: brute-force equivalence, the
  * repetition sensitivity that distinguishes it from the set form, and
  * hot-term cap semantics. */
class WeightedJaccardSpec extends SparkTestBase {

  private val rnd = new Random(110)

  private def bruteWJ(a: Seq[String], b: Seq[String]): Double = {
    val (ca, cb) = (a.groupBy(identity).view.mapValues(_.size),
      b.groupBy(identity).view.mapValues(_.size))
    val minsum = (ca.keySet & cb.keySet.toSet)
      .toSeq.map(t => math.min(ca(t), cb(t))).sum
    val maxsum = ca.values.sum + cb.values.sum - minsum
    if (maxsum == 0) 0.0 else minsum.toDouble / maxsum
  }

  private def toks(s: String): Seq[String] =
    s.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  test("matches brute force over a random corpus (cap off)") {
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docs = Seq.tabulate(40) { i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = DedupOps.weightedJaccardPairs(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        threshold = 0.4, maxTermDF = 0)
      .select("doc_a", "doc_b", "wjaccard")
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val want = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      j = bruteWJ(toks(ta), toks(tb)) if j >= 0.4
    } yield (ia, ib) -> j).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, k) }
  }

  test("repetition lowers weighted similarity where the set form saturates") {
    import spark.implicits._
    val docs = Seq((1L, "spam ham eggs"), (2L, "spam spam spam spam ham eggs"))
      .toDF("doc_id", "text")
    // identical vocab → set Jaccard (k=1 shingles) would be 1.0; weighted:
    // minsum = 1+1+1 = 3, maxsum = 4+1+1 = 6 → 0.5
    val rows = DedupOps.weightedJaccardPairs(docs, "doc_id", "text",
      threshold = 0.1, maxTermDF = 0).collect()
    assert(rows.length == 1 && math.abs(rows(0).getDouble(2) - 0.5) < 1e-12)
  }

  test("hot-term cap removes stop-terms from both mass and overlap") {
    import spark.implicits._
    // "the" appears in all 4 docs → df 4 > cap 3 → removed everywhere;
    // docs 1,2 then share everything, 3,4 share nothing
    val docs = Seq((1L, "the cat sat"), (2L, "the cat sat"),
      (3L, "the dog ran"), (4L, "the bird flew")).toDF("doc_id", "text")
    val rows = DedupOps.weightedJaccardPairs(docs, "doc_id", "text",
        threshold = 0.9, maxTermDF = 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 2L)))
  }

  test("plan: only 8-byte term hashes and counts reach the exchanges — never text") {
    import spark.implicits._
    val docs = Seq((1L, "some text here")).toDF("doc_id", "text")
    val joined = DedupOps.weightedJaccardPairs(docs, "doc_id", "text", 0.5)
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = plan.split("Exchange").drop(1)
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      val header = e.takeWhile(_ != '\n')
      assert(!header.contains("text"), s"text column in exchange: $header")
    }
  }
}
