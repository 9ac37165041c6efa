package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming: sketch aggregates as incremental window state. */
class StreamingSpec extends SparkTestBase {

  case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

  private def t(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $hour%02d:$minute%02d:00")

  test("windowed sketch aggregation across micro-batches merges state") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[Ev]
    val out = streaming.StreamingSketches.windowedProfile(
      mem.toDF(), window = "1 hour", slide = "1 hour", watermark = "10 hours")

    val query = out.writeStream
      .format("memory").queryName("stream_profile")
      .outputMode(OutputMode.Update())
      .start()
    try {
      // batch 1: three users in hour 10, two in hour 11
      mem.addData(
        Ev(t(10, 0), 1, "click", 10.0), Ev(t(10, 10), 2, "click", 20.0),
        Ev(t(10, 20), 3, "view", 30.0), Ev(t(11, 0), 7, "click", 5.0),
        Ev(t(11, 30), 8, "error", 6.0))
      query.processAllAvailable()
      // batch 2: one NEW user + one repeat in hour 10 → state must merge
      mem.addData(Ev(t(10, 40), 4, "view", 40.0), Ev(t(10, 50), 1, "click", 50.0))
      query.processAllAvailable()

      val rows = spark.sql(
        """SELECT window_start, approx_users, median_value
          |FROM stream_profile
          |ORDER BY window_start, approx_users""".stripMargin).collect()
      // last update for hour-10 window must count 4 distinct users
      val hour10 = rows.filter(_.getTimestamp(0) == t(10, 0))
      assert(hour10.map(_.getLong(1)).max == 4L,
        s"hour-10 distinct users should reach 4, got ${hour10.mkString(",")}")
      val hour11 = rows.filter(_.getTimestamp(0) == t(11, 0))
      assert(hour11.map(_.getLong(1)).max == 2L)
    } finally query.stop()
  }

  test("foreachBatch sink maintains a rollup-able parquet sketch table") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString

    val mem = MemoryStream[Ev]
    val query = streaming.StreamingSketches.sinkToSketchTable(
      mem.toDF(), dir, window = "1 hour", watermark = "10 hours")
    try {
      mem.addData(Ev(t(9, 0), 1, "click", 1.0), Ev(t(9, 30), 2, "view", 2.0))
      query.processAllAvailable()
      mem.addData(Ev(t(9, 45), 3, "click", 3.0)) // same window, new user
      query.processAllAvailable()

      // Roll up the appended sketch rows: duplicate window rows (one per
      // batch update) merge away through sketch union.
      spark.read.parquet(dir).createOrReplaceTempView("stream_sketches")
      val users = spark.sql(
        """SELECT window_start,
          |       CAST(round(datasketch_theta_estimate(datasketch_theta(users_sketch))) AS BIGINT) AS users
          |FROM stream_sketches GROUP BY window_start""".stripMargin).collect()
      assert(users.length == 1)
      assert(users.head.getLong(1) == 3L,
        s"rollup over batch updates must merge to 3 distinct users, got ${users.head}")
    } finally query.stop()
  }

  case class Doc(ts: Timestamp, doc_id: Long, text: String)

  test("streaming dedup drops repeated content within the watermark, keeps first") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[Doc]
    val out = streaming.StreamingDedup.dropDuplicateDocs(
      mem.toDF(), "ts", "text", watermark = "10 hours")
    val query = out.writeStream.format("memory").queryName("stream_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        Doc(t(10, 0), 1, "the quick brown fox"),
        Doc(t(10, 1), 2, "the  quick   brown fox"), // same after normalization
        Doc(t(10, 2), 3, "something else"))
      query.processAllAvailable()
      mem.addData(Doc(t(10, 5), 4, "the quick brown fox")) // cross-batch dup
      query.processAllAvailable()

      val kept = spark.sql("SELECT doc_id FROM stream_dedup ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(kept == Seq(1L, 3L), s"expected first-wins dedup, got $kept")
    } finally query.stop()
  }

  test("bloom-state streaming dedup: lifetime cross-batch dedup, bounded state") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[Doc]
    val out = streaming.StreamingDedup.dropDuplicateDocsBloom(
      mem.toDF(), "doc_id", "text", shards = 4)
    val query = out.writeStream.format("memory").queryName("stream_dedup_bloom")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        Doc(t(10, 0), 1, "the quick brown fox"),
        Doc(t(10, 1), 2, "the  quick   brown fox"), // same after normalization
        Doc(t(10, 2), 3, "something else"))
      query.processAllAvailable()
      // cross-batch dups arbitrarily far apart still drop (no watermark
      // horizon — the filter IS the history)
      mem.addData(
        Doc(t(23, 0), 4, "the quick brown fox"),
        Doc(t(23, 1), 5, "something else"),
        Doc(t(23, 2), 6, "genuinely new content"))
      query.processAllAvailable()

      val kept = spark.sql("SELECT doc_id FROM stream_dedup_bloom ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(kept == Seq(1L, 3L, 6L), s"expected lifetime first-wins dedup, got $kept")
    } finally query.stop()
  }

  test("streaming semantic dedup: kept-store semantics across batches") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(Long, Array[Float])]
    val cent = Array(Array(5.0, 0.0), Array(0.0, 5.0))
    val store = java.nio.file.Files.createTempDirectory("graft_ssd_t_store_").toString
    val query = streaming.StreamingDedup.semDedupSink(
      mem.toDF().toDF("id", "vec"), "id", "vec", cent, tau = 0.9, store)
    try {
      // batch 0: 1 kept; 2 ≈ 1 dropped (in-batch, smaller id wins)
      mem.addData((1L, Array(10f, 0f)), (2L, Array(10f, 0.1f)))
      query.processAllAvailable()
      // batch 1: 3 ≈ the KEPT store row 1 → dropped even though its id is
      //          smaller than nothing in this batch;
      //          4 is similar ONLY to the DROPPED row 2's direction — same
      //          direction as 1 too, so craft it orthogonal-to-1 instead:
      //          4 ⊥ cluster-0 store → kept (lands in cluster 1)
      mem.addData((3L, Array(10f, 0.2f)), (4L, Array(0f, 10f)))
      query.processAllAvailable()
      val verdicts = spark.read.parquet(store)
        .select(col("id"), col("batch_id"), col("kept"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(verdicts == Set((1L, 0L, true), (2L, 0L, false),
        (3L, 1L, false), (4L, 1L, true)), s"got $verdicts")
      // the kept slice of the same relation IS the corpus store
      val stored = spark.read.parquet(store).filter(col("kept")).select("id")
        .collect().map(_.getLong(0)).toSet
      assert(stored == Set(1L, 4L))
      // RESTART durability: a fresh query over the SAME store must dedup
      // against the persisted kept corpus (the store is the state — the
      // engine holds nothing between query lifetimes)
      query.stop()
      val mem2 = MemoryStream[(Long, Array[Float])]
      val query2 = streaming.StreamingDedup.semDedupSink(
        mem2.toDF().toDF("id", "vec"), "id", "vec", cent, tau = 0.9, store)
      try {
        mem2.addData((5L, Array(10f, 0.3f)), (6L, Array(-7f, 0f)))
        query2.processAllAvailable()
        val afterRestart = spark.read.parquet(store)
          .filter(col("id") >= 5L).select("id", "kept")
          .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
        // 5 ≈ stored row 1 → dropped across the restart; 6 points the
        // other way (cos ≈ −1) → kept
        assert(afterRestart == Set((5L, false), (6L, true)), s"got $afterRestart")
      } finally query2.stop()
    } finally {
      query.stop()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(store))
    }
  }

  test("streaming curation with the stored NB quality model gates admissions") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext

    // seed snapshot: curated vocabulary; the NB model and its admission
    // threshold are FIXED artifacts built before the stream starts
    val seed = Seq(
      (0L, "the curated encyclopedia article discusses science history and literature alpha"),
      (2L, "a curated reference article covers science literature and history beta"),
      (4L, "click here buy cheap pills now winner free casino bonus offer"),
      (6L, "free casino winner click buy now cheap bonus pills offer today")
    ).toDF("doc_id", "text")
    val model = operators.TextOps.seedCrawlNbFit(
      seed.filter($"doc_id" < 4), seed.filter($"doc_id" >= 4))
    val embs = Seq(
      0L -> Array(1f, 0f, 0f, 0f), 2L -> Array(0f, 1f, 0f, 0f),
      4L -> Array(0f, 0f, 1f, 0f), 6L -> Array(0f, 0f, 0f, 1f),
      11L -> Array(-1f, 0f, 0f, 0f), 13L -> Array(0f, -1f, 0f, 0f),
      15L -> Array(0f, 0f, -1f, 0f)).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cent = operators.KMeansOps.fit(
      embs.filter($"vec_id" % 2 === 0), "vec_id", "embedding", k = 2, iters = 2)

    val mem = MemoryStream[(Long, String)]
    val store = java.nio.file.Files.createTempDirectory("graft_curq_store_").toString
    val query = streaming.StreamingDedup.curateSink(
      mem.toDF().toDF("doc_id", "text"), seed, embs, "doc_id", "text",
      cent, store, nbModel = Some(model), minNbScoreU = 0L)
    try {
      mem.addData((11L, "a curated article about science history and literature"),
        (13L, "buy cheap casino bonus click here now free today"))
      query.processAllAvailable()
      mem.addData((15L, "another curated piece on literature science and history"))
      query.processAllAvailable()
      val v = spark.read.parquet(store)
        .select("doc_id", "decision", "batch_id")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(v(11L)._1 == "kept" && v(15L)._1 == "kept", s"$v")
      assert(v(13L)._1 == "low_quality", s"$v")
      assert(v(11L)._2 == 0L && v(15L)._2 == 1L)
      // the corpus store (kept slice of the same relation) excludes the
      // rejected doc, so later batches never dedup against junk
      val kept = spark.read.parquet(store).filter(col("decision") === "kept")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(11L, 15L))
    } finally {
      query.stop()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(store))
    }
  }

  test("streaming curation with the rule gate + PII release: filtered docs never admitted, store text scrubbed") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val seed = Seq(
      (0L, "the seed article covers science history and literature alpha"))
      .toDF("doc_id", "text")
    val embs = Seq(
      0L -> Array(1f, 0f, 0f, 0f), 11L -> Array(0f, 1f, 0f, 0f),
      13L -> Array(0f, 0f, 1f, 0f), 15L -> Array(0f, 0f, 0f, 1f))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cent = Array(Array(1.0, 0.0, 0.0, 0.0))
    val rp = operators.QualityFilters.RuleParams(minWords = 3, minStopHits = 1,
      minTermLines = 0)
    val mem = MemoryStream[(Long, String)]
    val store = java.nio.file.Files.createTempDirectory("graft_rule_store_").toString
    val query = streaming.StreamingDedup.curateSink(
      mem.toDF().toDF("doc_id", "text"), seed, embs, "doc_id", "text",
      cent, store, ruleParams = Some(rp), piiRedactOutput = true)
    try {
      mem.addData(
        (11L, "the contact line is user11@example.com at 10.0.0.1 ok"),
        (13L, "zz yy xx ww vv"))                    // no stopword -> rule_filtered
      query.processAllAvailable()
      mem.addData((15L, "the next article mentions science and history too"))
      query.processAllAvailable()
      // r19 advice fix: a later batch re-ingesting the ORIGINAL (pre-
      // redaction) text of an admitted PII-bearing doc must still read
      // exact_dup — the store's text is masked, so this only works if
      // the pre-redaction fingerprint was persisted and fed back.
      mem.addData((17L, "the contact line is user11@example.com at 10.0.0.1 ok"))
      query.processAllAvailable()
      val v = spark.read.parquet(store)
        .select("doc_id", "decision", "cleaned_text")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
      assert(v(11L)._1 == "kept" && v(15L)._1 == "kept" &&
        v(13L)._1 == "rule_filtered", s"$v")
      assert(v(17L)._1 == "exact_dup", s"$v")
      // released store text is scrubbed; the raw PII never lands on disk
      assert(v(11L)._2.contains("<EMAIL>") && v(11L)._2.contains("<IP>") &&
        !v(11L)._2.contains("@example.com"), v(11L)._2)
      // the persisted pre-redaction fingerprint is a 16 B digest, never
      // the raw text: recomputing it from the original matches, and no
      // store column contains the unmasked address
      val fpRow = spark.read.parquet(store)
        .filter(col("doc_id") === 11L).select("unredacted_fp").head()
      assert(fpRow.getString(0) != null && fpRow.getString(0).length == 32)
      // the kept slice (later batches' history) excludes the filtered doc
      val kept = spark.read.parquet(store).filter(col("decision") === "kept")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(11L, 15L))
    } finally {
      query.stop()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(store))
    }
  }

  test("streaming curation with a benchmark: contaminated docs never enter the store") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val run13 = (1 to 16).map(i => s"sv$i").mkString(" ")
    val seed = Seq((0L, "seed corpus document entirely original words")).toDF("doc_id", "text")
    val bench = Seq((100L, s"eval question $run13 eval answer")).toDF("doc_id", "text")
    val embs = Seq(0L -> Array(0f, 1f), 11L -> Array(0f, -1f),
        13L -> Array(1f, 0f), 15L -> Array(-1f, 0f)).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val benchEmb = Seq(100L -> Array(1f, 0f)).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cent = operators.KMeansOps.fit(
      embs.filter($"vec_id" === 0L), "vec_id", "embedding", k = 1, iters = 1)
    val mem = MemoryStream[(Long, String)]
    val store = java.nio.file.Files.createTempDirectory("graft_decon_store_").toString
    val query = streaming.StreamingDedup.curateSink(
      mem.toDF().toDF("doc_id", "text"), seed, embs, "doc_id", "text",
      cent, store, benchmark = Some(bench), benchmarkEmb = Some(benchEmb),
      contamNgramK = 13, contamCosTau = 0.9)
    try {
      mem.addData((11L, s"stream lead $run13 stream tail"),          // 13-gram grain
        (13L, "clean stream doc sharing no tokens with the eval"))   // cosine grain
      query.processAllAvailable()
      mem.addData((15L, "later clean stream document all original"))
      query.processAllAvailable()
      val v = spark.read.parquet(store).select("doc_id", "decision")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(v(11L) == "contaminated" && v(13L) == "contaminated", s"$v")
      assert(v(15L) == "kept", s"$v")
      val kept = spark.read.parquet(store).filter(col("decision") === "kept")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(15L), s"store must hold only clean admissions: $kept")
    } finally {
      query.stop()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(store))
    }
  }

  test("streaming curation with a media gate: bad-asset docs never enter the store") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val seed = Seq((0L, "seed corpus document entirely original words")).toDF("doc_id", "text")
    val embs = Seq(0L -> Array(0f, 1f), 11L -> Array(0f, -1f),
        13L -> Array(1f, 0f), 15L -> Array(-1f, 0f)).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cent = operators.KMeansOps.fit(
      embs.filter($"vec_id" === 0L), "vec_id", "embedding", k = 1, iters = 1)
    // fixed asset tables (the snapshot-artifact discipline: a production
    // sink joins each batch against its asset store by id)
    val videos = Seq(
      (11L, Array[Byte](1, 2, 3)),                                          // corrupt
      (13L, operators.Mp4Container.mux(6, Seq(operators.MediaOps.testPngBytes(7L)))),
      (15L, operators.Mp4Container.mux(6, Seq(operators.MediaOps.testPngBytes(9L))))
    ).toDF("doc_id", "content")
    val clips = Seq((13L, operators.MediaOps.constWavBytes(13L, 128))       // silent
    ).toDF("doc_id", "content")
    val mem = MemoryStream[(Long, String)]
    val store = java.nio.file.Files.createTempDirectory("graft_media_store_").toString
    val query = streaming.StreamingDedup.curateSink(
      mem.toDF().toDF("doc_id", "text"), seed, embs, "doc_id", "text",
      cent, store, video = Some(videos),
      videoContainer = operators.Mp4Container, audio = Some(clips))
    try {
      mem.addData((11L, "stream doc with the corrupt video asset"),
        (13L, "stream doc with the silent audio clip"))
      query.processAllAvailable()
      mem.addData((15L, "later stream document healthy video asset"))
      query.processAllAvailable()
      val v = spark.read.parquet(store).select("doc_id", "decision")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(v(11L) == "bad_media" && v(13L) == "bad_media", s"$v")
      assert(v(15L) == "kept", s"$v")
      val kept = spark.read.parquet(store).filter(col("decision") === "kept")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(15L), s"store must hold only clean admissions: $kept")
    } finally {
      query.stop()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(store))
    }
  }

  test("autosized bloom dedup deduplicates across batches end-to-end") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val out = streaming.StreamingDedup.dropDuplicateDocsBloomSized(
      mem.toDF(), "doc_id", "text", expectedDocs = 100000)
    val query = out.writeStream.format("memory").queryName("stream_dedup_sized")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(Doc(t(10, 0), 1, "alpha"), Doc(t(10, 1), 2, "beta"),
        Doc(t(10, 2), 3, "alpha"))
      query.processAllAvailable()
      mem.addData(Doc(t(23, 0), 4, "beta"), Doc(t(23, 1), 5, "gamma"))
      query.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM stream_dedup_sized ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(kept == Seq(1L, 2L, 5L), s"expected lifetime first-wins dedup, got $kept")
    } finally query.stop()
  }

  test("bloom dedup autosizing: coverage, byte budget, and empirical fpp bound") {
    import streaming.StreamingDedup.bloomSizing
    // coverage + budget invariants across the realistic parameter space
    for (docs <- Seq(10L * 1000, 5L * 1000 * 1000, 2L * 1000 * 1000 * 1000);
         fpp <- Seq(0.001, 0.01, 0.05)) {
      val s = bloomSizing(docs, fpp)
      assert(s.shards.toLong * s.maxDistinctPerShard >= (docs * 1.2).toLong,
        s"sizing must cover $docs docs with headroom: $s")
      val filterBytes = sketch.Bloom.create(s.maxDistinctPerShard, fpp).toByteArray.length
      assert(filterBytes <= (1280L << 10) * 1.15,
        s"per-shard filter ($filterBytes B) must respect the byte budget: $s")
    }
    // monotonicity: more docs never means fewer shards
    val shardCounts = Seq(1L << 20, 1L << 24, 1L << 28, 1L << 32)
      .map(d => bloomSizing(d).shards)
    assert(shardCounts == shardCounts.sorted, shardCounts.toString)
    // empirical fpp at design capacity: fill a filter sized by the same
    // bound (small byte budget so the test stays fast), then probe fresh
    // keys; the false-positive rate must hold near the advertised fpp
    val small = bloomSizing(10000, 0.01, targetShardBytes = 16L << 10)
    val f = sketch.Bloom.create(small.maxDistinctPerShard, 0.01)
    var i = 0L
    while (i < small.maxDistinctPerShard) {
      sketch.Bloom.update(f, s"doc-$i".getBytes("UTF-8")); i += 1
    }
    val probes = 20000
    val falsePos = (0 until probes).count(j =>
      sketch.Bloom.query(f, s"novel-$j".getBytes("UTF-8")))
    assert(falsePos <= probes * 0.025,
      s"fpp ${falsePos.toDouble / probes} exceeds 2.5x the advertised 0.01 at design capacity")
    // misconfiguration guards
    intercept[IllegalArgumentException](bloomSizing(0))
    intercept[IllegalArgumentException](bloomSizing(1000, fpp = 1.5))
  }

  test("sessionization closes sessions on event-time gaps, sketch state mergeable") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[Ev]
    val out = streaming.StreamingDedup.sessionize(
      mem.toDF(), gapMinutes = 30, watermark = "0 seconds")
    val query = out.writeStream.format("memory").queryName("stream_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two sessions separated by >30 min inside one batch;
      // user 2: one session
      mem.addData(
        Ev(t(9, 0), 1, "click", 1.0), Ev(t(9, 10), 1, "view", 2.0),
        Ev(t(10, 0), 1, "click", 3.0),
        Ev(t(9, 5), 2, "view", 4.0))
      query.processAllAvailable()
      // advance watermark far past every open session's timeout
      mem.addData(Ev(t(14, 0), 9, "click", 5.0))
      query.processAllAvailable()
      mem.addData(Ev(t(20, 0), 9, "click", 6.0))
      query.processAllAvailable()

      val rows = spark.sql(
        """SELECT user_id, session_start, events, approx_distinct_types
          |FROM stream_sessions ORDER BY user_id, session_start""".stripMargin).collect()
      val u1 = rows.filter(_.getLong(0) == 1L)
      assert(u1.length == 2, s"user 1 should have 2 sessions, got ${rows.mkString(",")}")
      assert(u1(0).getTimestamp(1) == t(9, 0) && u1(0).getLong(2) == 2L
        && u1(0).getLong(3) == 2L) // click+view distinct types
      assert(u1(1).getTimestamp(1) == t(10, 0) && u1(1).getLong(2) == 1L)
      val u2 = rows.filter(_.getLong(0) == 2L)
      assert(u2.length == 1 && u2.head.getLong(2) == 1L)
      // emitted sketch BLOBs re-aggregate with the batch merge functions
      val merged = spark.sql(
        """SELECT CAST(round(datasketch_theta_estimate(datasketch_theta(types_sketch))) AS BIGINT)
          |FROM stream_sessions WHERE user_id = 1""".stripMargin).head().getLong(0)
      assert(merged == 2L, s"merged session sketches should see 2 types, got $merged")
    } finally query.stop()
  }

  test("foreachBatch sinks are replay-idempotent: re-running a committed batchId is a no-op") {
    // Spark's contract after a driver failure is to RE-INVOKE foreachBatch
    // with the batchId it could not confirm; because these stores are read
    // back as admission history, an unguarded double-append would poison
    // every later trigger. Drive the per-trigger bodies directly so the
    // replay is deterministic: same data, same id, twice.
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._

    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    def snapshot(path: String): (Set[String], Seq[String]) = {
      val files = Option(new java.io.File(path).list()).get
        .filterNot(_.startsWith("_")).toSet
      val rows = spark.read.parquet(path).collect()
        .map(_.toString).toSeq.sorted
      (files, rows)
    }

    // --- semDedupSink body ---
    val cent = Array(Array(5.0, 0.0), Array(0.0, 5.0))
    val store1 = java.nio.file.Files.createTempDirectory("graft_replay_sem_").toString
    try {
      val b0 = Seq(1L -> Array(10f, 0f), 2L -> Array(10f, 0.1f)).toDF("id", "vec")
      val b1 = Seq(3L -> Array(10f, 0.2f), 4L -> Array(0f, 10f)).toDF("id", "vec")
      streaming.StreamingDedup.semDedupBatch(b0, 0L, "id", "vec", cent, 0.9, store1)
      streaming.StreamingDedup.semDedupBatch(b1, 1L, "id", "vec", cent, 0.9, store1)
      val before = snapshot(store1)
      // replay the last trigger (the post-restart case) …
      streaming.StreamingDedup.semDedupBatch(b1, 1L, "id", "vec", cent, 0.9, store1)
      assert(snapshot(store1) == before,
        "replaying batchId 1 must leave the store byte-identical")
      // … and an older already-committed trigger
      streaming.StreamingDedup.semDedupBatch(b0, 0L, "id", "vec", cent, 0.9, store1)
      assert(snapshot(store1) == before,
        "replaying batchId 0 must leave the store byte-identical")
      val verdicts = spark.read.parquet(store1).select("id", "kept")
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
      assert(verdicts == Set((1L, true), (2L, false), (3L, false), (4L, true)),
        s"replay must not change verdict semantics: $verdicts")
    } finally rm(new java.io.File(store1))

    // --- curateSink body ---
    val seed = Seq((0L, "seed corpus document entirely original words")).toDF("doc_id", "text")
    val embs = Seq(0L -> Array(0f, 1f), 11L -> Array(0f, -1f),
        13L -> Array(1f, 0f)).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cent1 = operators.KMeansOps.fit(
      embs.filter($"vec_id" === 0L), "vec_id", "embedding", k = 1, iters = 1)
    val store2 = java.nio.file.Files.createTempDirectory("graft_replay_cur_").toString
    try {
      val c0 = Seq((11L, "first stream document with original words")).toDF("doc_id", "text")
      val c1 = Seq((13L, "second stream document also fully original")).toDF("doc_id", "text")
      streaming.StreamingDedup.curateBatch(c0, 0L, seed, embs, "doc_id", "text", cent1, store2)
      streaming.StreamingDedup.curateBatch(c1, 1L, seed, embs, "doc_id", "text", cent1, store2)
      val before = snapshot(store2)
      streaming.StreamingDedup.curateBatch(c1, 1L, seed, embs, "doc_id", "text", cent1, store2)
      assert(snapshot(store2) == before,
        "replaying curate batchId 1 must leave the store byte-identical")
      streaming.StreamingDedup.curateBatch(c0, 0L, seed, embs, "doc_id", "text", cent1, store2)
      assert(snapshot(store2) == before,
        "replaying curate batchId 0 must leave the store byte-identical")
      val v = spark.read.parquet(store2).select("doc_id", "decision", "batch_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(v == Set((11L, "kept", 0L), (13L, "kept", 1L)), s"$v")
    } finally rm(new java.io.File(store2))
  }
}
