package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Relational/pipeline operator queries: media decode/resize/frame-sample,
  * as-of join, bloom prune, range bounds, join stats, profiler, top-k per
  * group, interval join, z-order layout.
  *
  * Split from SparkEntry (r15): entries and oracle SQL verbatim, combined
  * by [[SparkEntry.queries]] / [[SparkEntry.oracleSql]]. */
private[graft] trait RelationalEntries extends EntryInfra {

  protected def relationalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- multimodal columns -------------------------------------------------
    "q40_media_meta" -> qd { spark =>
      import org.apache.spark.sql.functions._
      operators.MediaOps.registerViews(spark)
      spark.table("media")
        .groupBy(col("meta.format").as("format"))
        .agg(count("*").as("cnt"), sum(col("meta.width")).as("total_width"),
          sum(length(col("content"))).as("total_bytes"))
        .orderBy("format")
    },

    "q41_frame_sample" -> qd { spark =>
      import org.apache.spark.sql.functions._
      operators.MediaOps.registerViews(spark)
      operators.MediaOps.frameSample(spark.table("media"), stepMs = 500)
        .groupBy("format").agg(count("*").as("frames"))
        .orderBy("format")
    },

    // REAL codec round-trip: deterministic grayscale PNGs encoded then
    // decoded with javax.imageio, both partition-parallel. The oracle
    // predicts decoded width/height/pixel-checksum in closed form (the
    // test image's gradient is wrap-free — see MediaOps.testPngBytes), so
    // this green means actual PNG decode, not header parsing.
    "q42_media_decode" -> qd { spark =>
      import org.apache.spark.sql.functions._
      val pngs = operators.MediaOps.pngTable(
        spark.table("documents").filter(col("doc_id") < 10))
      operators.MediaOps.decodeImages(pngs)
        .select(col("doc_id"), col("width"), col("height"), col("checksum"))
        .orderBy("doc_id")
    },

    // -- as-of join (union+window: ONE shuffle, no range-join explosion) ----
    "q47_asof_join" -> qd { spark =>
      import org.apache.spark.sql.functions._
      val ev = spark.table("events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "value")
      operators.AsOfJoin.asofJoin(clicks, views, "user_id", "ts", Seq("value"))
        .filter(col("event_id") % 20 === 0)
        .select(col("event_id"), col("value").as("view_value"))
        .orderBy("event_id")
    },

    // -- bloom join pruning (pre-shuffle fact filter; bloom has no false
    //    negatives, so pruned-join ≡ plain join exactly) --------------------
    "q48_bloom_prune" -> qd { spark =>
      import org.apache.spark.sql.functions._
      val dim = spark.table("supplier").filter(col("s_nationkey") === 3)
      operators.BloomPrune.bloomPrunedJoin(
          spark.table("lineitem"), "l_suppkey", dim, "s_suppkey",
          maxDistinct = 1 << 16, fpp = 0.01)
        .agg(count("*").as("matched_rows"),
          sum("l_quantity").cast("long").as("total_qty"),
          countDistinct("l_suppkey").as("suppliers"))
    },

    // -- KLL-driven range partitioning (exact regime: n ≤ K → cut points
    //    are exact order statistics → bucket histogram is oracle-exact) ----
    "q49_range_bounds" -> qd { spark =>
      import org.apache.spark.sql.functions._
      val src = spark.table("lineitem").filter(col("l_partkey") % 16 === 0)
      val bounds = operators.RangeBounds.fromColumn(src, "l_extendedprice", 4, kllK = 8192)
      src.select(operators.RangeBounds.bucket(col("l_extendedprice"), bounds.toSeq).as("bucket"))
        .groupBy("bucket").agg(count("*").as("cnt"))
        .orderBy("bucket")
    },

    // -- join-key overlap profiling (theta set algebra; exact regime at
    //    sf0.01: both key sets fit lg_k=14 exact mode) ----------------------
    "q52_join_stats" -> qd { spark =>
      import org.apache.spark.sql.functions._
      operators.JoinStats.keyOverlap(
          spark.table("orders").filter(col("o_orderkey") % 3 === 0), "o_custkey",
          spark.table("customer").filter(col("c_nationkey") < 13), "c_custkey",
          lgK = 14)
        .select(
          round(col("distinct_a")).cast("long").as("distinct_a"),
          round(col("distinct_b")).cast("long").as("distinct_b"),
          round(col("overlap")).cast("long").as("overlap"),
          round(col("union_keys")).cast("long").as("union_keys"),
          round(col("containment_a"), 6).as("containment_a"))
    },

    // -- one-pass column profiler (exact regime: n=922 ≤ kllK) --------------
    "q43_profiler" -> qd { spark =>
      import org.apache.spark.sql.functions._
      operators.Profiler.profile(
          spark.table("lineitem").filter(col("l_partkey") % 64 === 0),
          Seq("l_quantity", "l_suppkey", "l_returnflag"), kllK = 1024)
        .select(col("column"), col("approx_distinct"), col("n"),
          col("min"), col("max"), col("p50"), col("p95"))
        .orderBy("column")
    },

    // -- decode → resize chain (media pipeline stage 2): integer-factor
    //    area-average downscale over the REAL decoded raster. Closed form
    //    on the wrap-free gradient at factor 2: pixel2(x2) = base + 2*x2,
    //    so checksum2 = h2 * (w2*base + w2*(w2-1)). ----------------------
    "q72_media_resize" -> qd { spark =>
      import org.apache.spark.sql.functions._
      val pngs = operators.MediaOps.pngTable(
        spark.table("documents").filter(col("doc_id") < 10))
      operators.MediaOps.resizeImages(pngs, factor = 2)
        .select(col("doc_id"), col("width"), col("height"), col("checksum"))
        .orderBy("doc_id")
    },

    // -- REAL audio decode (javax.sound.sampled WAV parsing): hand-built
    //    canonical RIFF containers decoded distributed; oracle predicts
    //    rate / sample count / sample checksum in closed form. -----------
    "q73_audio_decode" -> qd { spark =>
      import org.apache.spark.sql.functions._
      val wavs = operators.MediaOps.wavTable(
        spark.table("documents").filter(col("doc_id") < 10))
      operators.MediaOps.decodeAudio(wavs)
        .select(col("doc_id"), col("sample_rate"), col("n_samples"), col("checksum"))
        .orderBy("doc_id")
    },

    // -- Z-ORDER (Morton) clustering key: bit-interleave 2 quantized
    //    dims so range-partition+sort co-locates rows close in BOTH dims
    //    → parquet min/max prunes scans on EITHER dim. Native codegen'd
    //    expression; the oracle recomputes the interleave arithmetically -
    "q111_zorder_key" -> qd { spark =>
      import org.apache.spark.sql.functions._
      val a = (col("user_id") % 256).cast("long")
      val b = least(greatest(floor(col("value")).cast("long"), lit(0L)), lit(255L))
      spark.table("events").filter(col("event_id") % 97 === 0)
        .select(col("event_id"), operators.ZOrder.zorderKey(8, a, b).as("zkey"))
        .orderBy("event_id")
    },

    // -- point-in-interval RANGE JOIN as a bucketed equi-join: OSS Spark
    //    plans a bare BETWEEN join as broadcast-nested-loop (O(P*I));
    //    quantizing the time domain restores an equi-key, the BETWEEN
    //    post-filter restores exactness, and each true pair is met once --
    "q109_interval_join" -> qd { spark =>
      import org.apache.spark.sql.functions._
      // the testdata ship/order dates are day-granular midnights, so the
      // join domain is epoch DAYS; bucket = 4 days over 7-day intervals
      // (expansion factor 2-3 buckets per interval)
      val pts = spark.table("lineitem")
        .select(col("l_orderkey"), col("l_quantity"),
          unix_date(col("l_shipdate").cast("date")).cast("long").as("t"))
      val iv = spark.table("orders").filter(col("o_orderkey") % 199 === 0)
        .select(col("o_orderkey"),
          unix_date(col("o_orderdate").cast("date")).cast("long").as("lo"))
        .withColumn("hi", col("lo") + lit(6L)) // inclusive 7-day window
      operators.RangeJoin.pointInInterval(pts, "t", iv, "lo", "hi",
          bucketWidth = 4L)
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("sum_qty"))
        .orderBy("o_orderkey")
    },

    // -- bounded top-k per group as an AGGREGATE (k-heap buffer, map-side
    //    combine): the shuffle carries <= partitions*k candidate rows per
    //    group instead of the window formulation's full-data shuffle+sort.
    //    The oracle IS that window formulation — same answer, worse plan --
    "q108_topk_per_group" -> qd { spark =>
      import org.apache.spark.sql.functions._
      operators.TopK.perGroup(spark.table("events"),
          Seq("event_type"), "value", "event_id", k = 3)
        .select(col("event_type"), col("rnk"), col("id").as("event_id"),
          col("score").as("value"))
        .orderBy("event_type", "rnk")
    },

    // -- VIDEO modality: deterministic GVID container (magic + fps +
    //    length-prefixed PNG frames) demuxed with REAL per-frame
    //    javax.imageio decode through the pluggable codec; every=2
    //    sampling decodes only the sampled frames (length-prefix seek
    //    past the rest). Closed-form per-frame checksums = the q42
    //    formulas at fid = 7·doc_id + frame_idx. -----------------------
    "q117_video_frames" -> qd { spark =>
      import org.apache.spark.sql.functions._
      val vids = operators.VideoOps.videoTable(
        spark.table("documents").filter(col("doc_id") < 8))
      operators.VideoOps.decodeFrames(vids, every = 2)
        .orderBy("doc_id", "frame_idx")
    },

    // -- REAL-container video: the same decodeFrames plan over genuine
    //    RIFF/AVI files (in-repo spec-correct muxer, linear-walk
    //    demuxer — the format MJPEG cameras/ffmpeg emit). Lossless PNG
    //    payloads keep the closed-form checksums oracle-expressible at
    //    fid = 11·doc_id + frame_idx; the true-MJPEG (JPEG-per-frame)
    //    path is pinned in OperatorsSpec against an in-JVM reference
    //    decode (lossy pixels have no ANSI closed form). --------------
    "q120_avi_demux" -> qd { spark =>
      import org.apache.spark.sql.functions._
      val vids = operators.AviContainer.aviTable(
        spark.table("documents").filter(col("doc_id") < 8))
      operators.VideoOps.decodeFrames(vids,
          container = operators.AviContainer, every = 2)
        .orderBy("doc_id", "frame_idx")
    },

    // -- REAL-container video, ISO BMFF leg: the same decodeFrames plan
    //    over genuine MP4 files (in-repo spec-correct muxer with 'jpeg'
    //    sample entries — the QuickTime motion-JPEG layout — and a
    //    box-tree demuxer walking stsd/stts/stsc/stsz/stco the way a
    //    player does). Lossless PNG payloads keep the closed-form
    //    checksums oracle-expressible at fid = 13·doc_id + frame_idx;
    //    the true-MJPEG path is pinned in OperatorsSpec against an
    //    in-JVM reference decode. ------------------------------------
    "q129_mp4_demux" -> qd { spark =>
      import org.apache.spark.sql.functions._
      val vids = operators.Mp4Container.mp4Table(
        spark.table("documents").filter(col("doc_id") < 8))
      operators.VideoOps.decodeFrames(vids,
          container = operators.Mp4Container, every = 2)
        .orderBy("doc_id", "frame_idx")
    },

    // -- REAL-container video, EBML/Matroska leg (completes the
    //    AVI → MP4 → MKV triple): the same decodeFrames plan over
    //    genuine MKV files (in-repo spec-correct muxer — EBML header,
    //    V_MJPEG TrackEntry, cluster-per-frame SimpleBlocks — and a
    //    recursive EBML walker selecting the track by TrackType).
    //    Lossless PNG payloads keep the closed-form checksums
    //    oracle-expressible at fid = 17·doc_id + frame_idx; the
    //    true-MJPEG path is pinned in OperatorsSpec against an in-JVM
    //    reference decode. -------------------------------------------
    "q130_mkv_demux" -> qd { spark =>
      import org.apache.spark.sql.functions._
      val vids = operators.MkvContainer.mkvTable(
        spark.table("documents").filter(col("doc_id") < 8))
      operators.VideoOps.decodeFrames(vids,
          container = operators.MkvContainer, every = 2)
        .orderBy("doc_id", "frame_idx")
    },

    // -- MIXED-container corpus through magic-byte auto-detection: one
    //    binary column holding AVI, MP4, AND MKV files (by doc_id % 3),
    //    demuxed in ONE decodeFrames pass via AutoContainer — nobody
    //    pre-sorts 100 TB of crawled video by format. Each container
    //    keeps its own closed-form frame grid, so the union stays
    //    oracle-expressible. -------------------------------------------
    "q134_mixed_container_demux" -> qd { spark =>
      import org.apache.spark.sql.functions._
      val vids = operators.VideoOps.mixedVideoTable(
        spark.table("documents").filter(col("doc_id") < 12))
      operators.VideoOps.decodeFrames(vids,
          container = operators.VideoOps.AutoContainer, every = 2)
        .orderBy("doc_id", "frame_idx")
    },

    // -- PERCEPTUAL image near-dup (r17): aHash over really-decoded
    //    PNGs through the simhash band core (banded equi-join
    //    candidates, exact recall by pigeonhole — never all-pairs).
    //    The fixture's pattern classes make the pair set closed-form:
    //    class 0 and its ±1-checker perturbation (class 2) collide at
    //    Hamming 0; cross-class distances are 32/64, so τ=2 separates
    //    exactly. -----------------------------------------------------
    "q144_perceptual_dup_pairs" -> qd { spark =>
      import org.apache.spark.sql.functions._
      val media = operators.MediaOps.perceptualTable(
        spark.table("documents").filter(col("doc_id") < 80))
      operators.MediaOps.perceptualDupPairs(media, maxDist = 2)
        .orderBy("doc_a", "doc_b")
    },

    // -- PERCEPTUAL audio near-dup (r17): envelope hash (64-segment
    //    mean profile) over really-decoded WAVs through the same
    //    simhash band core — class-2 clips are class-0 plus a uniform
    //    gain shift, which the mean-relative hash is invariant to by
    //    construction; cross-class Hamming 32/64. -----------------------
    "q152_audio_dup_pairs" -> qd { spark =>
      import org.apache.spark.sql.functions._
      val clips = operators.MediaOps.audioDupTable(
        spark.table("documents").filter(col("doc_id") < 80))
      operators.MediaOps.audioDupPairs(clips, maxDist = 2)
        .orderBy("doc_a", "doc_b")
    },

    // -- VIDEO segment near-dup (r17): the exact-substring dedup core
    //    over per-frame perceptual hashes — frame-hash rows through the
    //    same inverted-index + diagonal-islands plan as text spans
    //    (k=1), finding ≥4-frame aligned shared segments through REAL
    //    MP4 demux + decode. The scene-sequence fixture makes the
    //    segment set pure id arithmetic. ------------------------------
    "q153_video_dup_segments" -> qd { spark =>
      import org.apache.spark.sql.functions._
      val vids = operators.VideoOps.sceneVideoTable(
        spark.table("documents").filter(col("doc_id") < 60))
      operators.VideoOps.videoDupSegments(vids,
          container = operators.Mp4Container, minFrames = 4)
        .orderBy("doc_a", "doc_b")
    },

    // -- media-dup keep rule (r17): q144's pair evidence → connected
    //    components → the QUALITY keep rule (qualityKeepClusters with
    //    luminance checksum as the score): each perceptual cluster
    //    keeps its brightest member (the ±1-perturbed class-2 copies
    //    outshine class 0 by exactly 512), ties → min id. ------------
    "q148_media_dup_keep" -> qd { spark =>
      import org.apache.spark.sql.functions._
      val docs = spark.table("documents").filter(col("doc_id") < 80)
      val media = operators.MediaOps.perceptualTable(docs)
      val pairs = operators.MediaOps.perceptualDupPairs(media, maxDist = 2)
        .localCheckpoint(true)
      val scores = operators.MediaOps.decodeImages(media).toDF()
        .select(col("doc_id"), col("checksum"))
      operators.DedupOps.qualityKeepClusters(
          docs.select(col("doc_id")), pairs, scores, "doc_id",
          scoreCol = "checksum")
        .orderBy("doc_id")
    },
  )

  protected def relationalOracle: Map[String, String] = Map(
    // q144 fixture closed form: aHash equivalence classes by id
    // arithmetic (class 2 is class 0's ±1-checker perturbation — same
    // hash), intra-class Hamming 0, cross-class 32/64 → at τ=2 the pair
    // set is exactly the within-class id pairs
    "q144_perceptual_dup_pairs" ->
      """WITH t AS (SELECT doc_id,
        |                  CASE WHEN doc_id % 4 = 2 THEN 0 ELSE doc_id % 4 END AS cls
        |           FROM documents WHERE doc_id < 80)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(0 AS INT) AS dist
        |FROM t a JOIN t b ON a.cls = b.cls AND a.doc_id < b.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin,

    // q153 fixture closed form: doc id's frames are scenes (id+f) mod 7,
    // so matches lie on the single diagonal δ ≡ (db−da) mod 7 and the
    // maximal shared segment is 6−|δ| frames — ≥4 iff the residue is in
    // {0,1,2} (δ = residue, starts (δ,0)) or {5,6} (δ = residue−7,
    // starts (0,−δ))
    "q153_video_dup_segments" ->
      """WITH t AS (SELECT doc_id FROM documents WHERE doc_id < 60),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db,
        |             CAST((b.doc_id - a.doc_id) % 7 AS INT) AS d0
        |      FROM t a JOIN t b ON a.doc_id < b.doc_id),
        |m(d0, delta) AS (VALUES (0, 0), (1, 1), (2, 2), (6, -1), (5, -2))
        |SELECT p.da AS doc_a, p.db AS doc_b,
        |       CAST(CASE WHEN m.delta >= 0 THEN m.delta ELSE 0 END AS BIGINT) AS a_start,
        |       CAST(CASE WHEN m.delta >= 0 THEN 0 ELSE -m.delta END AS BIGINT) AS b_start,
        |       CAST(6 - abs(m.delta) AS BIGINT) AS shared_frames
        |FROM p JOIN m ON p.d0 = m.d0
        |ORDER BY doc_a, doc_b""".stripMargin,

    // q152 fixture closed form: envelope equivalence classes by id
    // arithmetic (class 2 = class 0 + a uniform gain shift the
    // mean-relative hash cannot see), intra-class Hamming 0
    "q152_audio_dup_pairs" ->
      """WITH t AS (SELECT doc_id,
        |                  CASE WHEN doc_id % 4 = 2 THEN 0 ELSE doc_id % 4 END AS cls
        |           FROM documents WHERE doc_id < 80)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(0 AS INT) AS dist
        |FROM t a JOIN t b ON a.cls = b.cls AND a.doc_id < b.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin,

    // q148: clusters = the q144 equivalence classes (component label =
    // min member id); keeper = the brightest member — class-2 copies
    // carry +512 luminance, so eqclass 0 keeps its min class-2 id,
    // equal-luminance classes fall back to min id
    "q148_media_dup_keep" ->
      """WITH t AS (SELECT doc_id,
        |                  CASE WHEN doc_id % 4 = 2 THEN 0 ELSE doc_id % 4 END AS cls
        |           FROM documents WHERE doc_id < 80),
        |c AS (SELECT cls, min(doc_id) AS cluster,
        |             coalesce(min(doc_id) FILTER (WHERE cls = 0 AND doc_id % 4 = 2),
        |                      min(doc_id)) AS keeper
        |      FROM t GROUP BY cls)
        |SELECT t.doc_id, c.cluster, (t.doc_id = c.keeper) AS kept
        |FROM t JOIN c USING (cls) ORDER BY doc_id""".stripMargin,

    "q40_media_meta" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
        |       count(*) AS cnt,
        |       CAST(sum(320 + (doc_id % 8) * 160) AS BIGINT) AS total_width,
        |       CAST(sum(16 + octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1 ORDER BY format""".stripMargin,

    "q41_frame_sample" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
        |       CAST(sum(CAST(floor((1000 + (doc_id % 60) * 500 - 1) / 500) AS BIGINT) + 1) AS BIGINT) AS frames
        |FROM documents GROUP BY 1 ORDER BY format""".stripMargin,

    // decoded width/height and the pixel checksum of the wrap-free
    // gradient: h * (w*base + w*(w-1)/2) with base = doc_id % 200
    "q42_media_decode" ->
      """SELECT doc_id,
        |       CAST(16 + doc_id % 8 AS INT) AS width,
        |       CAST(12 + doc_id % 5 AS INT) AS height,
        |       CAST((12 + doc_id % 5) *
        |            ((16 + doc_id % 8) * (doc_id % 200) +
        |             (16 + doc_id % 8) * (16 + doc_id % 8 - 1) / 2) AS BIGINT)
        |         AS checksum
        |FROM documents WHERE doc_id < 10 ORDER BY doc_id""".stripMargin,

    "q47_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |     r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view')
        |SELECT l.event_id, r.value AS view_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |WHERE l.event_id % 20 = 0 ORDER BY event_id""".stripMargin,

    "q48_bloom_prune" ->
      """SELECT CAST(count(*) AS BIGINT) AS matched_rows,
        |       CAST(sum(l_quantity) AS BIGINT) AS total_qty,
        |       count(DISTINCT l_suppkey) AS suppliers
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_nationkey = 3""".stripMargin,

    "q49_range_bounds" ->
      """WITH src AS (SELECT CAST(l_extendedprice AS DOUBLE) v FROM lineitem
        |             WHERE l_partkey % 16 = 0),
        |ranked AS (SELECT v, cume_dist() OVER (ORDER BY v) cd FROM src),
        |b AS (SELECT (SELECT min(v) FROM ranked WHERE cd >= 0.25) b1,
        |             (SELECT min(v) FROM ranked WHERE cd >= 0.5)  b2,
        |             (SELECT min(v) FROM ranked WHERE cd >= 0.75) b3)
        |SELECT bucket, count(*) AS cnt FROM (
        |  SELECT CASE WHEN v > b3 THEN 3 WHEN v > b2 THEN 2
        |              WHEN v > b1 THEN 1 ELSE 0 END AS bucket
        |  FROM src, b)
        |GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q52_join_stats" ->
      """WITH a AS (SELECT DISTINCT o_custkey k FROM orders WHERE o_orderkey % 3 = 0),
        |     b AS (SELECT DISTINCT c_custkey k FROM customer WHERE c_nationkey < 13),
        |     s AS (SELECT (SELECT count(*) FROM a) AS da,
        |                  (SELECT count(*) FROM b) AS db,
        |                  (SELECT count(*) FROM (SELECT k FROM a INTERSECT SELECT k FROM b)) AS ov,
        |                  (SELECT count(*) FROM (SELECT k FROM a UNION SELECT k FROM b)) AS un)
        |SELECT da AS distinct_a, db AS distinct_b, ov AS overlap, un AS union_keys,
        |       round(CAST(ov AS DOUBLE) / CAST(da AS DOUBLE), 6) AS containment_a
        |FROM s""".stripMargin,

    "q43_profiler" ->
      """WITH src AS (SELECT * FROM lineitem WHERE l_partkey % 64 = 0),
        |q AS (SELECT v, cume_dist() OVER (ORDER BY v) cd
        |      FROM (SELECT l_quantity v FROM src)),
        |s AS (SELECT v, cume_dist() OVER (ORDER BY v) cd
        |      FROM (SELECT CAST(l_suppkey AS DOUBLE) v FROM src))
        |SELECT * FROM (
        |  SELECT 'l_quantity' AS "column",
        |         CAST((SELECT count(DISTINCT l_quantity) FROM src) AS DOUBLE) AS approx_distinct,
        |         (SELECT count(*) FROM src) AS n,
        |         (SELECT min(l_quantity) FROM src) AS min,
        |         (SELECT max(l_quantity) FROM src) AS max,
        |         (SELECT min(v) FROM q WHERE cd >= 0.5) AS p50,
        |         (SELECT min(v) FROM q WHERE cd >= 0.95) AS p95
        |  UNION ALL
        |  SELECT 'l_suppkey',
        |         CAST((SELECT count(DISTINCT l_suppkey) FROM src) AS DOUBLE),
        |         (SELECT count(*) FROM src),
        |         (SELECT min(CAST(l_suppkey AS DOUBLE)) FROM src),
        |         (SELECT max(CAST(l_suppkey AS DOUBLE)) FROM src),
        |         (SELECT min(v) FROM s WHERE cd >= 0.5),
        |         (SELECT min(v) FROM s WHERE cd >= 0.95)
        |  UNION ALL
        |  SELECT 'l_returnflag',
        |         CAST((SELECT count(DISTINCT l_returnflag) FROM src) AS DOUBLE),
        |         NULL, NULL, NULL, NULL, NULL)
        |ORDER BY "column"""".stripMargin,

    // resized dims + checksum of the area-averaged wrap-free gradient
    "q72_media_resize" ->
      """WITH g AS (SELECT doc_id,
        |                  CAST(floor((16 + doc_id % 8) / 2) AS INT) AS w2,
        |                  CAST(floor((12 + doc_id % 5) / 2) AS INT) AS h2,
        |                  doc_id % 200 AS base
        |           FROM documents WHERE doc_id < 10)
        |SELECT doc_id, w2 AS width, h2 AS height,
        |       CAST(h2 * (w2 * base + w2 * (w2 - 1)) AS BIGINT) AS checksum
        |FROM g ORDER BY doc_id""".stripMargin,

    // decoded WAV facts: sample(i) = base + i%50 over n samples →
    // checksum = k(50·base + 1225) + r·base + r(r−1)/2, k = n/50, r = n%50
    "q73_audio_decode" ->
      """WITH g AS (SELECT doc_id,
        |                  400 + doc_id % 100 AS n,
        |                  doc_id % 200 AS base
        |           FROM documents WHERE doc_id < 10)
        |SELECT doc_id, 8000 AS sample_rate, CAST(n AS INT) AS n_samples,
        |       CAST((n // 50) * (50 * base + 1225) + (n % 50) * base
        |            + (n % 50) * (n % 50 - 1) / 2 AS BIGINT) AS checksum
        |FROM g ORDER BY doc_id""".stripMargin,

    // the window formulation graft_topk_by replaces: row_number over a
    // full partition sort, score DESC / id ASC tie-break
    "q108_topk_per_group" ->
      """WITH w AS (SELECT event_type, event_id, value,
        |                  row_number() OVER (PARTITION BY event_type
        |                    ORDER BY value DESC, event_id) AS rnk
        |           FROM events)
        |SELECT event_type, CAST(rnk AS BIGINT) AS rnk, event_id, value
        |FROM w WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin,

    // the naive non-equi BETWEEN join the bucketed range join replaces
    // (DuckDB's IEJoin handles this shape natively; OSS Spark does not)
    "q109_interval_join" ->
      """SELECT o.o_orderkey, CAST(count(*) AS BIGINT) AS n_items,
        |       sum(l.l_quantity) AS sum_qty
        |FROM orders o JOIN lineitem l
        |  ON l.l_shipdate >= o.o_orderdate
        | AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
        |WHERE o.o_orderkey % 199 = 0
        |GROUP BY o.o_orderkey ORDER BY o.o_orderkey""".stripMargin,

    // arithmetic re-derivation of the Morton interleave: bit j of dim 0
    // at key bit 2j, of dim 1 at 2j+1 (dim 0 least significant)
    "q111_zorder_key" ->
      """SELECT event_id,
        |       CAST(list_sum(list_transform(range(0, 8), i ->
        |         ((((user_id % 256) >> i) & 1) << (2*i)) |
        |         (((least(greatest(CAST(floor(value) AS BIGINT), 0), 255) >> i) & 1) << (2*i + 1))
        |       )) AS BIGINT) AS zkey
        |FROM events WHERE event_id % 97 = 0 ORDER BY event_id""".stripMargin,

    // closed-form frame grid: 3 + id%4 frames at 10 fps, sampled every 2;
    // per-frame dims/checksum are the q42 closed forms at fid = 7·id + f
    "q117_video_frames" ->
      """WITH f AS (SELECT doc_id, unnest(range(0, 3 + doc_id % 4, 2)) AS frame_idx
        |           FROM documents WHERE doc_id < 8),
        |x AS (SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |             7 * doc_id + frame_idx AS fid FROM f)
        |SELECT doc_id, frame_idx,
        |       CAST(frame_idx * 100 AS BIGINT) AS ts_ms,
        |       CAST(16 + fid % 8 AS INT) AS width,
        |       CAST(12 + fid % 5 AS INT) AS height,
        |       CAST((12 + fid % 5) * ((16 + fid % 8) * (fid % 200) +
        |            (16 + fid % 8) * (16 + fid % 8 - 1) / 2) AS BIGINT) AS checksum
        |FROM x ORDER BY doc_id, frame_idx""".stripMargin,

    // closed-form frame grid through the REAL AVI container: 2 + id%4
    // frames at 12 fps, sampled every 2; ts = floor(idx*1000/12); dims/
    // checksum are the q42 closed forms at fid = 11·id + frame_idx
    "q120_avi_demux" ->
      """WITH f AS (SELECT doc_id, unnest(range(0, 2 + doc_id % 4, 2)) AS frame_idx
        |           FROM documents WHERE doc_id < 8),
        |x AS (SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |             11 * doc_id + frame_idx AS fid FROM f)
        |SELECT doc_id, frame_idx,
        |       CAST(floor(frame_idx * 1000 / 12) AS BIGINT) AS ts_ms,
        |       CAST(16 + fid % 8 AS INT) AS width,
        |       CAST(12 + fid % 5 AS INT) AS height,
        |       CAST((12 + fid % 5) * ((16 + fid % 8) * (fid % 200) +
        |            (16 + fid % 8) * (16 + fid % 8 - 1) / 2) AS BIGINT) AS checksum
        |FROM x ORDER BY doc_id, frame_idx""".stripMargin,

    // closed-form frame grid through the REAL MP4 container: 3 + id%3
    // frames at 8 fps, sampled every 2; ts = idx*125 exactly; dims/
    // checksum are the q42 closed forms at fid = 13·id + frame_idx
    "q129_mp4_demux" ->
      """WITH f AS (SELECT doc_id, unnest(range(0, 3 + doc_id % 3, 2)) AS frame_idx
        |           FROM documents WHERE doc_id < 8),
        |x AS (SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |             13 * doc_id + frame_idx AS fid FROM f)
        |SELECT doc_id, frame_idx,
        |       CAST(frame_idx * 125 AS BIGINT) AS ts_ms,
        |       CAST(16 + fid % 8 AS INT) AS width,
        |       CAST(12 + fid % 5 AS INT) AS height,
        |       CAST((12 + fid % 5) * ((16 + fid % 8) * (fid % 200) +
        |            (16 + fid % 8) * (16 + fid % 8 - 1) / 2) AS BIGINT) AS checksum
        |FROM x ORDER BY doc_id, frame_idx""".stripMargin,

    // closed-form frame grid through the REAL MKV container: 2 + id%3
    // frames at 5 fps, sampled every 2; ts = idx*200 exactly; dims/
    // checksum are the q42 closed forms at fid = 17·id + frame_idx
    "q130_mkv_demux" ->
      """WITH f AS (SELECT doc_id, unnest(range(0, 2 + doc_id % 3, 2)) AS frame_idx
        |           FROM documents WHERE doc_id < 8),
        |x AS (SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |             17 * doc_id + frame_idx AS fid FROM f)
        |SELECT doc_id, frame_idx,
        |       CAST(frame_idx * 200 AS BIGINT) AS ts_ms,
        |       CAST(16 + fid % 8 AS INT) AS width,
        |       CAST(12 + fid % 5 AS INT) AS height,
        |       CAST((12 + fid % 5) * ((16 + fid % 8) * (fid % 200) +
        |            (16 + fid % 8) * (16 + fid % 8 - 1) / 2) AS BIGINT) AS checksum
        |FROM x ORDER BY doc_id, frame_idx""".stripMargin,

    // mixed-container closed forms by doc_id % 3: AVI (11·id+f grid at
    // 12 fps, 2+id%4 frames) / MP4 (13·id+f at 8 fps, 3+id%3) / MKV
    // (17·id+f at 5 fps, 2+id%3); ts = floor(idx·1000/fps) in all three
    "q134_mixed_container_demux" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         CASE doc_id % 3 WHEN 0 THEN 2 + doc_id % 4
        |              WHEN 1 THEN 3 + doc_id % 3
        |              ELSE 2 + doc_id % 3 END AS nf,
        |         CASE doc_id % 3 WHEN 0 THEN 11 WHEN 1 THEN 13 ELSE 17 END AS mult,
        |         CASE doc_id % 3 WHEN 0 THEN 12 WHEN 1 THEN 8 ELSE 5 END AS fps
        |  FROM documents WHERE doc_id < 12),
        |f AS (SELECT doc_id, unnest(range(0, nf, 2)) AS frame_idx, mult, fps FROM p),
        |x AS (SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |             mult * doc_id + frame_idx AS fid, fps FROM f)
        |SELECT doc_id, frame_idx,
        |       CAST(floor(frame_idx * 1000 / fps) AS BIGINT) AS ts_ms,
        |       CAST(16 + fid % 8 AS INT) AS width,
        |       CAST(12 + fid % 5 AS INT) AS height,
        |       CAST((12 + fid % 5) * ((16 + fid % 8) * (fid % 200) +
        |            (16 + fid % 8) * (16 + fid % 8 - 1) / 2) AS BIGINT) AS checksum
        |FROM x ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
