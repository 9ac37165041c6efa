package graft

import org.apache.spark.sql.functions._

import operators._

/** Sub-document-grain dedup: paragraph/chunk dedup with reassembly
  * ([[ParagraphDedup]]) and exact duplicated-span detection
  * ([[SpanDedup]]). */
class DedupGrainSpec extends SparkTestBase {

  private lazy val docs = {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d.cache().count()
    d
  }

  test("native GramHashes matches the array-ops reference formulation") {
    for (k <- Seq(1, 3, 8)) {
      val fast = SpanDedup.gramRelation(docs.limit(40), "doc_id", "text", k)
        .orderBy("doc", "pos")
      val ref = docs.limit(40)
        .select(col("doc_id").as("doc"), SpanDedup.gramHashesArrayOps(col("text"), k).as("ga"))
        .select(col("doc"), posexplode(col("ga")))
        .select(col("doc"), col("pos").cast("long").as("pos"), col("col").as("g"))
        .orderBy("doc", "pos")
      assert(fast.exceptAll(ref).count() == 0 && ref.exceptAll(fast).count() == 0,
        s"positional gram hashes differ at k=$k")
    }
    // fewer than k tokens → EMPTY (no whole-doc fold, unlike ShingleSet)
    val edge = spark.sql("SELECT * FROM VALUES ('one two', 1L), ('', 2L) t(text, doc_id)")
    assert(SpanDedup.gramRelation(edge, "doc_id", "text", 3).count() == 0)
  }

  test("native WordChunks/WordWindows match the composed formulations") {
    for (k <- Seq(1, 3, 10)) {
      val both = docs.limit(40).select(
        ParagraphDedup.chunkArray(col("text"), k).as("fast"),
        ParagraphDedup.chunkArrayOps(col("text"), k).as("ref"))
      assert(both.filter(not(col("fast") <=> col("ref"))).count() == 0,
        s"chunk arrays differ at k=$k")
    }
    // windows vs the q67 composed shape (full windows only)
    val w = docs.limit(40).selectExpr(
      "graft_word_windows(text, 3) AS fast",
      """CASE WHEN size(split(trim(text), '\\s+')) >= 3
        |  THEN transform(sequence(0, size(split(trim(text), '\\s+')) - 3),
        |    i -> concat_ws(' ', split(trim(text), '\\s+')[i],
        |      split(trim(text), '\\s+')[i+1], split(trim(text), '\\s+')[i+2]))
        |  ELSE array() END AS ref""".stripMargin)
    assert(w.filter(not(col("fast") <=> col("ref"))).count() == 0)
    // edges: blank → empty, multi-space collapse, short docs
    val edge = spark.sql(
      "SELECT * FROM VALUES ('   '), ('a  b   c d'), ('x y') t(s)")
      .select(ParagraphDedup.chunkArray(col("s"), 3).as("c"),
        col("s")).collect()
    assert(edge(0).getSeq[String](0).isEmpty)
    assert(edge(1).getSeq[String](0) == Seq("a b c", "d"))
    assert(edge(2).getSeq[String](0) == Seq("x y"))
  }

  test("paragraphDedup drops repeated chunks globally, first occurrence wins") {
    val d = spark.sql(
      """SELECT * FROM VALUES
        | (1L, 'a b c d e f g'),
        | (2L, 'a b c x y z'),
        | (3L, 'd e f d e f'),
        | (4L, '   ') t(doc_id, text)""".stripMargin)
    val out = ParagraphDedup.paragraphDedup(d, "doc_id", "text", chunkWords = 3)
      .orderBy("doc_id").collect()
    // blank doc 4 is excluded; doc 1 keeps all 3 chunks (incl. short tail)
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out(0).getLong(1) == 3 && out(0).getLong(2) == 0 &&
      out(0).getString(3) == "a b c d e f g")
    // doc 2: 'a b c' already seen in doc 1
    assert(out(1).getLong(1) == 1 && out(1).getLong(2) == 1 &&
      out(1).getString(3) == "x y z")
    // doc 3: both its chunks equal doc 1's 'd e f' → everything drops
    assert(out(2).getLong(1) == 0 && out(2).getLong(2) == 2 &&
      out(2).getString(3) == "")
  }

  test("paragraphDedup drops an intra-document repeat, keeps the earlier position") {
    val d = spark.sql("SELECT * FROM VALUES (1L, 'p q r s t u p q r v w x') t(doc_id, text)")
    val out = ParagraphDedup.paragraphDedup(d, "doc_id", "text", chunkWords = 3)
      .collect().head
    assert(out.getLong(1) == 3 && out.getLong(2) == 1)
    assert(out.getString(3) == "p q r s t u v w x")
  }

  test("duplicatedSpans finds a maximal aligned run with correct offsets") {
    val a = (1 to 30).map(i => s"a$i").mkString(" ")
    val d = spark.sql(
      s"""SELECT * FROM VALUES
         | (1L, '$a'),
         | (2L, 'x1 x2 x3 x4 x5 $a') t(doc_id, text)""".stripMargin)
    val out = SpanDedup.duplicatedSpans(d, "doc_id", "text", k = 8, minSpan = 20)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 0L && r.getLong(3) == 5L && r.getLong(4) == 30L)
    // the same pair is below a higher threshold
    assert(SpanDedup.duplicatedSpans(d, "doc_id", "text", k = 8, minSpan = 40).count() == 0)
  }

  test("duplicatedSpans splits on a single-token edit (island maximality)") {
    val left = (1 to 15).map(i => s"a$i")
    val right = (17 to 30).map(i => s"a$i")
    val orig = (left ++ Seq("a16") ++ right).mkString(" ")
    val edited = (left ++ Seq("EDIT") ++ right).mkString(" ")
    val d = spark.sql(
      s"SELECT * FROM VALUES (1L, '$orig'), (2L, '$edited') t(doc_id, text)")
    val out = SpanDedup.duplicatedSpans(d, "doc_id", "text", k = 8, minSpan = 10)
      .orderBy("a_start").collect()
    // two maximal spans: tokens 0..14 (15) and 16..29 (14), same diagonal
    assert(out.length == 2)
    assert(out(0).getLong(2) == 0L && out(0).getLong(4) == 15L)
    assert(out(1).getLong(2) == 16L && out(1).getLong(4) == 14L)
  }

  test("hot-gram cap excludes boilerplate grams from span detection") {
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val rows = (1 to 4).map(i => s"(${i}L, '$boiler u${i}1 u${i}2 u${i}3')").mkString(", ")
    val d = spark.sql(s"SELECT * FROM VALUES $rows t(doc_id, text)")
    // every boilerplate gram occurs 4× > cap 3 → no candidate pairs at all
    assert(SpanDedup.duplicatedSpans(d, "doc_id", "text", k = 8, minSpan = 8,
      maxGramOccurrences = 3).count() == 0)
    // cap off: all 6 pairs share the 10-token boilerplate span
    val uncapped = SpanDedup.duplicatedSpans(d, "doc_id", "text", k = 8, minSpan = 8,
      maxGramOccurrences = 0).collect()
    assert(uncapped.length == 6 && uncapped.forall(_.getLong(4) == 10L))
    // cap boundary: a gram occurring EXACTLY cap times is kept (the old
    // size(occ) <= cap filter semantics the bounded aggregate replaces)
    val atCap = SpanDedup.duplicatedSpans(d, "doc_id", "text", k = 8, minSpan = 8,
      maxGramOccurrences = 4).collect()
    assert(atCap.length == 6 && atCap.forall(_.getLong(4) == 10L))
  }

  test("duplicatedSpans ≡ naive quadratic span finder on random corpora") {
    import spark.implicits._
    // ground truth: for every doc pair, every maximal aligned run of
    // ≥ minSpan identical tokens — O(n²·len²), fine at test size
    def naive(docs: Seq[(Long, String)], k: Int, minSpan: Int): Set[(Long, Long, Long, Long, Long)] = {
      val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toIndexedSeq }
      val out = scala.collection.mutable.Set.empty[(Long, Long, Long, Long, Long)]
      for ((ida, ta) <- toks; (idb, tb) <- toks if ida < idb) {
        // diagonal d = posA - posB; runs of token equality along it
        for (d <- -(tb.length - 1) to (ta.length - 1)) {
          var pb = math.max(0, -d)
          while (pb + d < ta.length && pb < tb.length) {
            if (ta(pb + d) == tb(pb)) {
              val start = pb
              while (pb + d < ta.length && pb < tb.length && ta(pb + d) == tb(pb)) pb += 1
              val run = pb - start
              if (run >= minSpan)
                out += ((ida, idb, (start + d).toLong, start.toLong, run.toLong))
            } else pb += 1
          }
        }
      }
      out.toSet
    }
    val rnd = new scala.util.Random(8517)
    for (trial <- 0 until 6) {
      val vocabSize = 3 + rnd.nextInt(4) // small vocab → plenty of chance runs
      val docs = (0L until 10L).map { id =>
        id -> (0 until (15 + rnd.nextInt(25)))
          .map(_ => s"t${rnd.nextInt(vocabSize)}").mkString(" ")
      }
      // k = 1: positional token relation, spans = raw runs — the naive
      // finder's exact grain (k > 1 gram spans are unions of k-windows,
      // covered by the closed-form tests above)
      val got = SpanDedup.duplicatedSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", k = 1, minSpan = 4, maxGramOccurrences = 0)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      val want = naive(docs, 1, 4)
      assert(got == want,
        s"trial $trial: missing=${want -- got} extra=${got -- want}")
    }
  }

  test("BoundedOccListAgg buffer: overflow tombstones, frees memory, survives merge") {
    val buf = new BoundedOccListAgg.Buf(3)
    buf.add(1L, 0L); buf.add(2L, 1L); buf.add(3L, 2L)
    assert(buf.size == 3 && !buf.overflowed)
    buf.add(4L, 3L) // past the cap: terminal overflow, arrays released
    assert(buf.overflowed && buf.docs == null && buf.size == 0)
    buf.add(5L, 4L) // later adds are no-ops
    assert(buf.overflowed)
    // merge: clean + clean past the cap overflows; overflow is infectious
    val a = new BoundedOccListAgg.Buf(3); a.add(1L, 0L); a.add(2L, 0L)
    val b = new BoundedOccListAgg.Buf(3); b.add(3L, 0L); b.add(4L, 0L)
    a.mergeFrom(b)
    assert(a.overflowed, "2 + 2 pairs must overflow a cap-3 buffer")
    val c = new BoundedOccListAgg.Buf(3); c.add(1L, 0L)
    c.mergeFrom(buf)
    assert(c.overflowed, "merging an overflowed partial must tombstone the target")
    // at-cap merge stays clean
    val e = new BoundedOccListAgg.Buf(3); e.add(1L, 0L)
    val f = new BoundedOccListAgg.Buf(3); f.add(2L, 0L); f.add(3L, 0L)
    e.mergeFrom(f)
    assert(!e.overflowed && e.size == 3)
  }

  test("removeDuplicatedSpans cuts the b-side copy, keeps the lowest-id copy") {
    val a = (1 to 30).map(i => s"a$i").mkString(" ")
    val d = spark.sql(
      s"""SELECT * FROM VALUES
         | (1L, '$a'),
         | (2L, 'x1 x2 x3 x4 x5 $a'),
         | (3L, 'u1 u2 u3 u4 u5 u6 u7 u8 u9 u10') t(doc_id, text)""".stripMargin)
    val out = SpanDedup.removeDuplicatedSpans(d, "doc_id", "text", k = 8, minSpan = 20)
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    // doc 1 keeps its copy whole
    assert(out(0).getLong(1) == 30 && out(0).getLong(2) == 0 && out(0).getString(3) == a)
    // doc 2 loses the 30-token duplicated run, keeps its unique prefix
    assert(out(1).getLong(1) == 5 && out(1).getLong(2) == 30 &&
      out(1).getString(3) == "x1 x2 x3 x4 x5")
    // doc 3 shares nothing and passes through
    assert(out(2).getLong(2) == 0 && out(2).getString(3).startsWith("u1 u2"))
  }

  test("removeDuplicatedSpans unions overlapping cut ranges from several partners") {
    val t1 = (1 to 30).map(i => s"a$i").mkString(" ")
    val t2 = (11 to 40).map(i => s"a$i").mkString(" ")
    val t3 = (1 to 40).map(i => s"a$i").mkString(" ")
    val d = spark.sql(
      s"SELECT * FROM VALUES (1L, '$t1'), (2L, '$t2'), (3L, '$t3') t(doc_id, text)")
    val out = SpanDedup.removeDuplicatedSpans(d, "doc_id", "text", k = 8, minSpan = 20)
      .orderBy("doc_id").collect()
    // doc 1 untouched; doc 2 loses its 20-token overlap with doc 1
    // (pos 0..19), keeping a31..a40; doc 3 is covered by the union of the
    // (1,3) span [0,30) and the (2,3) span [10,40) → fully removed
    assert(out(0).getLong(2) == 0)
    assert(out(1).getLong(1) == 10 && out(1).getLong(2) == 20 &&
      out(1).getString(3) == (31 to 40).map(i => s"a$i").mkString(" "))
    assert(out(2).getLong(1) == 0 && out(2).getLong(2) == 40 &&
      out(2).getString(3) == "")
  }

  test("crossSpans reports corpus-vs-benchmark overlap, no within-side pairs") {
    val shared = (1 to 25).map(i => s"s$i").mkString(" ")
    val corp = spark.sql(
      s"""SELECT * FROM VALUES
         | (1L, 'c1 c2 c3 $shared'),
         | (2L, 'c1 c2 c3 $shared'),
         | (3L, 'n1 n2 n3 n4 n5 n6 n7 n8 n9') t(doc_id, text)""".stripMargin)
    val bench = spark.sql(s"SELECT * FROM VALUES (100L, '$shared') t(doc_id, text)")
    val out = SpanDedup.crossSpans(corp, bench, "doc_id", "text",
      k = 8, minSpan = 20).orderBy("left_id").collect()
    // docs 1 AND 2 both hit the benchmark (within-corpus 1~2 duplication
    // is NOT reported — that's duplicatedSpans' job); doc 3 is clean
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out.forall(r => r.getLong(1) == 100L && r.getLong(2) == 3L &&
      r.getLong(3) == 0L && r.getLong(4) == 25L))
  }

  test("q84/q85 driver entries return the documented shapes at sf0.001") {
    val p = SparkEntry.queries("q84_paragraph_dedup")(spark, "/root/testdata/sf0.001")
    assert(p.columns.toSeq ==
      Seq("doc_id", "kept_chunks", "dropped_chunks", "cleaned_text"))
    val rows = p.collect()
    assert(rows.nonEmpty && rows.forall(r => r.getLong(1) + r.getLong(2) > 0))
    val s = SparkEntry.queries("q85_duplicated_spans")(spark, "/root/testdata/sf0.001")
    assert(s.columns.toSeq ==
      Seq("doc_a", "doc_b", "a_start", "b_start", "span_tokens"))
    assert(s.collect().forall(_.getLong(4) >= 20))
    val r = SparkEntry.queries("q86_span_removal")(spark, "/root/testdata/sf0.001")
    assert(r.columns.toSeq ==
      Seq("doc_id", "kept_tokens", "removed_tokens", "cleaned_text"))
    assert(r.collect().forall(x => x.getLong(1) + x.getLong(2) > 0))
  }

  test("occurrence cap boundary: df == cap pairs, df == cap+1 drops (self)") {
    // the r16 grouped shape filters size(occ) <= cap; the pre-r16 join
    // shape dropped df > cap — this pins the boundary they must share
    val run = (1 to 10).map(i => s"s$i").mkString(" ")
    val rows = (1 to 3).map(i => s"(${i}L, '$run u${i}1 u${i}2 u${i}3')").mkString(", ")
    val d = spark.sql(s"SELECT * FROM VALUES $rows t(doc_id, text)")
    // every shared gram occurs exactly 3×: cap 3 keeps them (3 pairs)
    assert(SpanDedup.duplicatedSpans(d, "doc_id", "text", k = 8, minSpan = 8,
      maxGramOccurrences = 3).count() == 3)
    assert(SpanDedup.duplicatedSpans(d, "doc_id", "text", k = 8, minSpan = 8,
      maxGramOccurrences = 2).count() == 0)
  }

  test("cross-span cap boundary governs the UNION mass of both sides") {
    val run = (1 to 10).map(i => s"c$i").mkString(" ")
    val corp = spark.sql(
      s"SELECT * FROM VALUES (1L, '$run x1 x2 x3'), (2L, '$run y1 y2 y3') t(doc_id, text)")
    val bench = spark.sql(s"SELECT * FROM VALUES (100L, '$run') t(doc_id, text)")
    // shared grams occur 2 (left) + 1 (right) = 3 times: cap 3 keeps
    // both cross pairs, cap 2 excludes the grams entirely
    assert(SpanDedup.crossSpans(corp, bench, "doc_id", "text", k = 8,
      minSpan = 8, maxGramOccurrences = 3).count() == 2)
    assert(SpanDedup.crossSpans(corp, bench, "doc_id", "text", k = 8,
      minSpan = 8, maxGramOccurrences = 2).count() == 0)
  }

  test("Pipeline.widenIfNarrow re-spreads a narrow leaf, leaves a wide one alone") {
    val par = spark.sparkContext.defaultParallelism
    val narrow = spark.range(1000).toDF("id").coalesce(1).localCheckpoint(true)
    assert(narrow.rdd.getNumPartitions == 1)
    val widened = Pipeline.widenIfNarrow(narrow)
    assert(widened.rdd.getNumPartitions == par)
    assert(widened.count() == 1000)
    val wide = spark.range(1000).toDF("id").repartition(par + 3).localCheckpoint(true)
    assert(Pipeline.widenIfNarrow(wide).rdd.getNumPartitions == par + 3)
  }
}
