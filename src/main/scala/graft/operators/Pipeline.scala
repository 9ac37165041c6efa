package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the canonical training-data flow composed
  * from the engine's operators, one annotated DataFrame out:
  *
  *   1. exact dedup (md5 fingerprint; keep the lowest id per group),
  *   2. near dedup (MinHash+LSH candidates, exact-Jaccard verified; drop
  *      the higher id of every qualifying pair),
  *   3. quality floor ([[TextOps.qualityScore]]),
  *   4. language annotation ([[TextOps.langId]]).
  *
  * Every row is kept with a `decision` ∈ {kept, exact_dup, near_dup,
  * low_quality} rather than filtered away, so the curation run is
  * auditable and each reason's volume is one `GROUP BY` away. Shapes are
  * the scale-safe ones throughout: fingerprint window, banded LSH
  * equi-join, no text in any shuffle after tokenization.
  */
object Pipeline {

  /** Evaluate independent stage computations CONCURRENTLY (guide §2.6:
    * Spark's scheduler runs several jobs at once inside one application;
    * actions are only sequential because driver code calls them
    * sequentially). Every thunk here materializes an eager
    * localCheckpoint of a drop relation that depends only on an
    * already-materialized upstream leaf — the three media-integrity
    * arms, the three perceptual-dup arms, the history/batch embedding
    * slices — so running them from a small thread pool lets each job's
    * tail back-fill the executors the others free, instead of paying
    * three full job latencies end to end (measured on q132: the three
    * decode arms were 5.3 s of an 11.9 s run, sequential by construction
    * only). Results (the checkpointed DataFrames) are identical — only
    * the submission order changes. Exceptions propagate unwrapped. */
  private def parEval[T](thunks: Seq[() => T]): Seq[T] =
    if (thunks.lengthCompare(2) < 0) thunks.map(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
      try {
        val futs = thunks.map { t =>
          pool.submit(new java.util.concurrent.Callable[T] {
            override def call(): T = t()
          })
        }
        futs.map { f =>
          try f.get()
          catch { case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
          }
        }
      } finally pool.shutdown()
    }

  /** [[parEval]] over optional arms: present arms run concurrently, the
    * option structure is preserved for the caller's union/getOrElse. */
  private def parEvalOpt(arms: Seq[Option[() => DataFrame]]): Seq[Option[DataFrame]] = {
    val results = parEval(arms.flatten)
    var i = -1
    arms.map(_.map { _ => i += 1; results(i) })
  }

  /** The relation re-spread to cluster parallelism when its materialized
    * source sits below it. AQE's size-based post-shuffle coalesce is
    * tuned for IO-bound work, so at small corpus sizes a checkpointed
    * stage like span removal lands on 1–2 partitions; a downstream scan
    * whose per-row cost is HASHING-scale (the NB feature pass: md5 per
    * uni/bigram) then runs on 1–2 of N cores (measured: 4.1 s over a
    * 2-partition checkpoint vs 0.9 s at 32 — the same starvation
    * `EntryInfra.widenedIfHeavy` fixes for narrow source files). Only
    * such consumers get this wrapper — for the cheap-per-row scans
    * (shingling, token counts) the extra exchange costs more than the
    * imbalance (measured: blanket-widening every stage checkpoint cost
    * q112 +1.2 s for zero downstream win).
    *
    * `df` must be a narrow chain over an already-materialized
    * (checkpointed) leaf, so the partition probe triggers no job. At
    * production scale stage outputs exceed parallelism and this is the
    * identity. */
  /** The three modality arms of the `bad_media` gate as ONE distinct'd
    * drop relation over `survivors` (the exact-dedup output — only docs
    * still in play get their assets decoded):
    *  - image ([[MediaOps.decodeStatus]]): decode-fail / out-of-band
    *    mean luminance / uniform raster,
    *  - video ([[VideoOps.decodeStatus]]): demux-fail / zero decodable
    *    frames (dead payloads) / out-of-band luminance / every-frame-
    *    uniform (blank stream),
    *  - audio ([[MediaOps.audioStatus]]): decode-fail / zero samples /
    *    silent (every sample equal).
    * Each arm is one partition-parallel decode pass, failures kept as
    * status rows (no second scan of the binary column), checkpointed as
    * its own leaf. The union is DISTINCT because modalities may overlap
    * on a doc, and the caller left-joins this relation in the final
    * assembly — duplicates would fan out output rows. Shared by
    * [[curateFull]] (stage 1.5) and [[curateIncremental]] (stage 1.5,
    * judging only batch docs). */
  private def mediaGateDrops(survivors: DataFrame, idCol: String,
      media: Option[DataFrame], mediaCodec: MediaOps.ImageCodec,
      mediaGrid: Int, minMeanLum: Double, maxMeanLum: Double,
      video: Option[DataFrame], videoContainer: VideoOps.VideoContainer,
      videoEvery: Int, audio: Option[DataFrame],
      audioCodec: MediaOps.AudioCodec, empty: DataFrame): DataFrame = {
    val id = col(idCol)
    def inPlay(assets: DataFrame): DataFrame =
      assets.select(col(idCol).as("doc_id"), col("content"))
        .join(survivors.select(id.as("doc_id")), Seq("doc_id"), "left_semi")
    // the three modality decodes are independent full passes over their
    // own asset relations — materialize them concurrently ([[parEval]])
    val Seq(imageArm, videoArm, audioArm) = parEvalOpt(Seq(
      media.map { m => () =>
        val mean = col("checksum").cast("double") / (col("width") * col("height"))
        MediaOps.decodeStatus(inPlay(m), mediaCodec, mediaGrid).toDF()
          .filter(!col("ok") || mean < minMeanLum || mean > maxMeanLum ||
            col("uniform"))
          .select(col("doc_id").as("__media_drop")).localCheckpoint(eager = true)
      },
      video.map { v => () =>
        val vMean = col("pix_sum").cast("double") / col("pix_cnt")
        VideoOps.decodeStatus(inPlay(v), videoContainer, mediaCodec, videoEvery).toDF()
          .filter(!col("ok") || col("n_decoded") === 0 ||
            vMean < minMeanLum || vMean > maxMeanLum || col("uniform"))
          .select(col("doc_id").as("__media_drop")).localCheckpoint(eager = true)
      },
      audio.map { a => () =>
        MediaOps.audioStatus(inPlay(a), audioCodec).toDF()
          .filter(!col("ok") || col("n_samples") === 0 || col("silent"))
          .select(col("doc_id").as("__media_drop")).localCheckpoint(eager = true)
      }))
    val imageDrops = imageArm.getOrElse(empty)
    val videoDrops = videoArm.getOrElse(empty)
    val audioDrops = audioArm.getOrElse(empty)
    imageDrops.union(videoDrops).union(audioDrops).distinct()
  }

  /** A one-column drop leaf re-labeled to the shared `__dropped` name so
    * drop sets from different stages can union (r21). */
  private def dropCol(df: DataFrame): DataFrame =
    df.select(col(df.columns.head).as("__dropped"))

  /** Survivors of `base` against a cumulative drop-id union (r21): ONE
    * left-anti join per stage input instead of a CHAIN of k anti-joins.
    * The chained shape paid O(k²) broadcast builds per curate run —
    * every stage's lazy input plan re-executed every upstream stage's
    * anti-join inside each of its own jobs (stage k's checkpoint job
    * rebuilt k−1 broadcasts; measured across q132's 15 stage jobs the
    * rebuild latency dominated the sub-second stages). The union of
    * drop leaves is the same O(duplicates) id mass the individual sets
    * were — AQE broadcasts it when small, shuffles when not (never
    * forced, the drop-set discipline) — and at scale one anti-join
    * against the union shuffles the corpus ONCE per stage instead of k
    * times. */
  private def minusDrops(base: DataFrame, id: org.apache.spark.sql.Column,
                         drops: DataFrame): DataFrame =
    base.join(drops, id === col("__dropped"), "left_anti")

  private[graft] def widenIfNarrow(df: DataFrame): DataFrame =
    widenIfNarrow(df, df)

  /** [[widenIfNarrow]] probing `leaf`'s partition count instead of
    * `df`'s own — for consumers that derive from the materialized `leaf`
    * through a join or other exchange-bearing step: `df.rdd` on an AQE
    * plan EXECUTES its shuffles (the documented trap), so probing the
    * join plan itself would run the join twice. The leaf's count is the
    * right signal anyway: AQE coalescing the checkpoint to 1–2
    * partitions is what starves the downstream hashing-scale scan. */
  private[graft] def widenIfNarrow(df: DataFrame, leaf: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (leaf.rdd.getNumPartitions < par) df.repartition(par) else df
  }

  /** @param knownNearDupPairs pre-mined verified near-dup pair evidence
    *        with (doc_a, doc_b) columns — the same corpus-snapshot memo
    *        lifecycle as `knownHot`: a production pipeline materializes
    *        the pair set when a snapshot is admitted, and every consumer
    *        (clustering, removal, curation) reads the persisted evidence
    *        instead of re-mining the corpus. Must come from the same
    *        (corpus, shingleK, nearDupThreshold) parameters; when None,
    *        the pairs are mined inline. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             nearDupThreshold: Double = 0.9, minQuality: Double = 0.2,
             shingleK: Int = 3, maxShingleDF: Int = 1000,
             knownHot: Option[Array[Long]] = None,
             knownNearDupPairs: Option[DataFrame] = None): DataFrame = {
    val id = col(idCol)

    // 1. exact-dup drop set: the ranking window sees only (fp, id) pairs,
    //    so full document rows never enter an exchange (the drop sets
    //    join back against the scan; AQE broadcasts them when small)
    val dropExact = DedupOps.dupIds(docs, idCol, textCol)
      .select(col("__dup_id").as("__exact_drop"))

    // 2. near-dup drop set: higher id of every verified pair (hot-shingle
    //    cap threaded through — boilerplate must not go quadratic here)
    val dropNear = knownNearDupPairs
      .getOrElse(DedupOps.minhashLshPairs(docs, idCol, textCol, shingleK, nearDupThreshold,
        maxShingleDF = maxShingleDF, knownHot = knownHot))
      .select(col("doc_b").as("__near_drop")).distinct()

    // NO forced broadcast on the drop sets: their size is O(duplicates),
    // which on a web-scale corpus can be 30–50% of the input — far past
    // any driver/executor broadcast budget. AQE broadcasts them at
    // runtime when they really are small; when they are not, the plain
    // shuffle join is the only plan that completes.
    docs
      .join(dropExact, id === col("__exact_drop"), "left")
      .join(dropNear, id === col("__near_drop"), "left")
      .withColumn("quality", TextOps.qualityScore(col(textCol)))
      .withColumn("lang", TextOps.langId(col(textCol)))
      .withColumn("decision",
        when(col("__exact_drop").isNotNull, "exact_dup")
          .when(col("__near_drop").isNotNull, "near_dup")
          .when(col("quality") < minQuality, "low_quality")
          .otherwise("kept"))
      .drop("__exact_drop", "__near_drop")
  }

  /** The FULL curation pipeline at the r14 operator grain, stages chained
    * so each consumes the previous stage's survivors:
    *
    *   1. exact dedup (normalized fingerprint; lowest id survives),
    *   1.5. (optional, `media`) media-integrity gate: an image-bearing
    *      doc whose asset fails decode, or decodes blank/extreme →
    *      `bad_media`; (optional, `video`) the video arm of the same
    *      gate — demux failure, zero decodable frames, out-of-band
    *      luminance, or every-frame-uniform (blank stream) →
    *      `bad_media` too; (optional, `audio`) the audio arm —
    *      decode failure, zero samples, or a silent clip →
    *      `bad_media` as well,
    *   1.75. (optional, `benchmark`) eval-suite decontamination: a
    *      survivor sharing a k-gram shingle with the benchmark or
    *      reaching `contamCosTau` embedding cosine against any
    *      benchmark vector → `contaminated` (its text never feeds the
    *      gram statistics downstream),
    *   2. duplicated-SPAN removal — survivor text is REWRITTEN (cleaned),
    *      and a doc cleaned down to nothing is `empty`,
    *   2.5. (optional, `seedFilter`) trained-quality gate: NB
    *      seed-vs-crawl classifier scores the CLEANED text; integer
    *      log-odds below `minNbScoreU` → `low_quality`,
    *   3. near dedup over the CLEANED text (exact n-gram Jaccard ≥
    *      `nearDupThreshold`; higher id of each pair drops),
    *   4. semantic dedup over the survivors' embeddings (k-means
    *      bucketed, SemDeDup keep rule at cosine `semTau`),
    *   5. per-source token quota over cleaned token counts.
    *
    * One row out per input document: (id, source, decision,
    * removed_tokens, n_tokens, final_md5), decision ∈ {exact_dup,
    * bad_media, media_dup, wrong_lang, contaminated, empty, low_quality,
    * near_dup, sem_dup, over_quota, kept}; n_tokens/final_md5 are
    * non-null for kept rows only, so the result IS the survivor corpus
    * fingerprint and the per-stage decision counts in one relation.
    *
    * Scale shape: every stage emits a DROP SET (O(duplicates) id rows,
    * AQE-broadcastable when small, shuffle-joinable when not — never
    * forced), chained by left-anti joins; text crosses an exchange only
    * inside span removal's bounded reassembly join. Centroids are k×dim
    * driver values (the [[KMeansOps.fit]] contract). The final assembly
    * is the docs scan plus five id-keyed left joins. */
  /** [[curateFull]] with [[HtmlExtract]] as STAGE 0 — the pipeline a
    * web crawl actually runs: `pages` carries raw markup in `htmlCol`;
    * block segmentation + jusText-class content rules produce the
    * clean-text column every later stage consumes. One mapPartitions
    * prepended to the chain (no shuffle, no extra checkpoint — the
    * exact stage's scan absorbs it); a page whose markup yields no
    * content text flows through as an empty doc (its fingerprint groups
    * with other empties — the exact stage's documented behavior).
    * Passthrough knobs stay at [[curateFull]] defaults; deployments
    * needing the full surface call `extract` + `curateFull` directly.
    *
    * STAGE 0.5 (optional, r19) — per-DOMAIN curation, the web-pipeline
    * gate between extraction and exact dedup: when `urlCol` names the
    * pages' raw-URL column, each page's canonical domain
    * ([[UrlOps.canonicalize]] → [[UrlOps.domain]], codegen'd built-ins)
    * drives two drops BEFORE any cross-document statistics:
    *  - `domainBlocklist` (a (domain) relation, AQE-broadcast
    *    anti-join) → decision `blocked_domain`,
    *  - `domainTokenBudget` > 0 → the deterministic per-domain token
    *    cap ([[QuotaSample.tokenQuota]] with domain as the group — the
    *    4096-bucket two-level scan, no per-domain straggler window) →
    *    decision `over_domain_quota`.
    * One crawl host can neither dominate the mix nor feed the dedup/
    * gram statistics past its cap. Dropped pages still get their one
    * output row (the audit contract); both knobs off → prior shape
    * byte-identical. */
  def curateFromHtml(pages: DataFrame, embeddings: DataFrame,
                     idCol: String, htmlCol: String, sourceCol: String,
                     minWords: Int = HtmlExtract.DefaultMinWords,
                     maxLinkDensity: Double = HtmlExtract.DefaultMaxLinkDensity,
                     textCol: String = "text",
                     urlCol: Option[String] = None,
                     domainBlocklist: Option[DataFrame] = None,
                     domainTokenBudget: Long = 0L,
                     langModel: Option[TextOps.LangNbModel] = None,
                     langAllow: Seq[String] = Seq("en"),
                     ruleParams: Option[QualityFilters.RuleParams] = None,
                     piiRedactOutput: Boolean = false): DataFrame = {
    val id = col(idCol)
    // Extraction is eagerly checkpointed (r19): curateFull's stages each
    // keep their `docs` input in lineage (only DROP SETS checkpoint), so
    // an uncheckpointed extraction chain re-parses every page once PER
    // STAGE — measured 2× on the q149 floor once the page fixture moved
    // to the memo (the replayed local relation re-shuffles its bytes on
    // every lineage re-execution where a parquet scan only re-reads
    // cached footers). One parse pass, stages read a leaf.
    val extracted = HtmlExtract.extract(pages, idCol, htmlCol,
        minWords, maxLinkDensity)
      .select(col(idCol), col("extracted_text").as(textCol))
      .join(pages.select(col(idCol), col(sourceCol)), Seq(idCol))
      .localCheckpoint(eager = true)
    if (urlCol.isEmpty)
      return curateFull(extracted, embeddings, idCol, textCol, sourceCol,
        langModel = langModel, langAllow = langAllow,
        ruleParams = ruleParams, piiRedactOutput = piiRedactOutput)
    require(domainBlocklist.nonEmpty || domainTokenBudget > 0,
      "urlCol given but neither domainBlocklist nor domainTokenBudget is set")
    val domains = pages.select(col(idCol),
      UrlOps.domain(UrlOps.canonicalize(col(urlCol.get))).as("__domain"))
    val withDom = extracted.join(domains, Seq(idCol))
    val blockedDrops = domainBlocklist.map { bl =>
      withDom.join(broadcast(bl.select(col("domain").as("__domain"))),
          Seq("__domain"), "left_semi")
        .select(id.as("__blocked_drop")).localCheckpoint(eager = true)
    }.getOrElse(pages.limit(0).select(id.as("__blocked_drop")))
    val s0 = withDom.join(blockedDrops, id === col("__blocked_drop"), "left_anti")
    val domQuotaDrops =
      if (domainTokenBudget <= 0) pages.limit(0).select(id.as("__domq_drop"))
      else QuotaSample.tokenQuota(s0, "__domain", idCol, textCol, domainTokenBudget)
        .filter(!col("kept")).select(id.as("__domq_drop"))
        .localCheckpoint(eager = true)
    // same rationale: the domain survivors feed every curateFull stage
    val survivors = s0.join(domQuotaDrops, id === col("__domq_drop"), "left_anti")
      .drop("__domain").localCheckpoint(eager = true)
    val curated = curateFull(survivors, embeddings, idCol, textCol, sourceCol,
      langModel = langModel, langAllow = langAllow,
      ruleParams = ruleParams, piiRedactOutput = piiRedactOutput)
    // dropped pages keep their one audit row, ahead of every downstream
    // decision class (they never entered the corpus the stages judged)
    val droppedRows = pages.select(id, col(sourceCol))
      .join(blockedDrops, id === col("__blocked_drop"), "left")
      .join(domQuotaDrops, id === col("__domq_drop"), "left")
      .filter(col("__blocked_drop").isNotNull || col("__domq_drop").isNotNull)
      .select(id, col(sourceCol),
        when(col("__blocked_drop").isNotNull, "blocked_domain")
          .otherwise("over_domain_quota").as("decision"),
        lit(0L).as("removed_tokens"),
        lit(null).cast("long").as("n_tokens"),
        lit(null).cast("string").as("final_md5"))
    curated.unionByName(droppedRows)
  }

  def curateFull(docs: DataFrame, embeddings: DataFrame,
                 idCol: String, textCol: String, sourceCol: String,
                 vecIdCol: String = "vec_id", vecCol: String = "embedding",
                 nearDupThreshold: Double = 0.9, shingleK: Int = 3,
                 maxShingleDF: Int = 1000,
                 spanK: Int = 8, minSpan: Int = 20, maxGramOccurrences: Int = 1000,
                 semK: Int = 8, semIters: Int = 2, semTau: Double = 0.35,
                 tokenBudget: Long = 700L,
                 seedFilter: Option[org.apache.spark.sql.Column] = None,
                 crawlFilter: Option[org.apache.spark.sql.Column] = None,
                 nbBuckets: Int = 4096, minNbScoreU: Long = 0L,
                 lowQualityFraction: Double = 0.0,
                 media: Option[DataFrame] = None,
                 mediaCodec: MediaOps.ImageCodec = MediaOps.ImageIoCodec,
                 mediaGrid: Int = 2,
                 minMeanLum: Double = 5.0, maxMeanLum: Double = 250.0,
                 mediaDup: Option[DataFrame] = None,
                 mediaDupMaxDist: Int = 2,
                 audioDup: Option[DataFrame] = None,
                 audioDupMaxDist: Int = 2,
                 videoDup: Option[DataFrame] = None,
                 videoDupMinFrames: Int = 6,
                 video: Option[DataFrame] = None,
                 videoContainer: VideoOps.VideoContainer = VideoOps.GvidContainer,
                 videoEvery: Int = 1,
                 audio: Option[DataFrame] = None,
                 audioCodec: MediaOps.AudioCodec = MediaOps.JavaSoundCodec,
                 benchmark: Option[DataFrame] = None,
                 benchmarkEmb: Option[DataFrame] = None,
                 contamNgramK: Int = 3, contamCosTau: Double = 0.3,
                 langModel: Option[TextOps.LangNbModel] = None,
                 langAllow: Seq[String] = Seq("en"),
                 ruleParams: Option[QualityFilters.RuleParams] = None,
                 piiRedactOutput: Boolean = false): DataFrame = {
    val id = col(idCol)

    // Each stage output is EAGERLY localCheckpoint'ed — the Components
    // precedent, for the same reason: every stage both feeds the next
    // stage AND the final assembly, and several stages iterate (k-means)
    // or self-join (near-dup) over the previous one, so an unbroken
    // lineage makes the final plan tree grow EXPONENTIALLY in stage count
    // (measured: the composed query spent ~18 s in Catalyst
    // analysis/optimization alone at sf0.1 with all data cached — 4× the
    // actual compute). Checkpointing makes each stage a leaf: compute
    // runs exactly once, downstream plans stay O(stage). Blocks free
    // with the session (or an explicit unpersist sweep); a deployment
    // persists stage outputs as tables — same lifecycle, durable.

    // 1. exact dedup
    val exactDrops = DedupOps.dupIds(docs, idCol, textCol)
      .select(col("__dup_id").as("__exact_drop")).localCheckpoint(eager = true)
    val drops1 = dropCol(exactDrops)
    val s1 = minusDrops(docs, id, drops1)

    // 1.5 (optional, r16) media-integrity gate — all three modality
    //     arms ([[mediaGateDrops]]): a doc whose image fails decode /
    //     is blank / extreme, whose video fails demux / decodes zero
    //     frames / is a blank stream, or whose audio fails decode / is
    //     empty / silent, drops as `bad_media` BEFORE the text stages —
    //     its text must not feed gram statistics any more than its
    //     pixels feed training. One decode pass per modality, per-
    //     partition, no shuffle; docs without an asset row pass
    //     untouched. All None → empty drop set, q112 unchanged.
    val mediaDrops = mediaGateDrops(s1, idCol,
      media, mediaCodec, mediaGrid, minMeanLum, maxMeanLum,
      video, videoContainer, videoEvery, audio, audioCodec,
      docs.limit(0).select(id.as("__media_drop")))
    val drops2 = drops1.union(dropCol(mediaDrops))
    val s1m = minusDrops(docs, id, drops2)

    // 1.6 (optional, r17; r19: three modality arms) perceptual MEDIA
    //     near-dup — the modality twin of the text near-dup stage, run
    //     BEFORE the text stages (a duplicate asset's caption must not
    //     feed gram statistics twice). Each arm judges the SAME
    //     integrity-survivor set independently (modalities are
    //     independent duplicate evidence, the [[mediaGateDrops]]
    //     discipline) and the drops union-DISTINCT as `media_dup`:
    //      - image (`mediaDup`): aHash through the banded Hamming join
    //        ([[MediaOps.perceptualDupPairs]]); each perceptual cluster
    //        keeps its brightest member (luminance-checksum argmax via
    //        [[DedupOps.qualityKeepClusters]], ties → min id),
    //      - audio (`audioDup`): envelope hash through the same band
    //        core ([[MediaOps.audioDupPairs]]); the higher id of every
    //        pair drops (the text near-dup keep rule — no luminance
    //        analog for clips),
    //      - video (`videoDup`): per-frame perceptual hashes through
    //        the exact-substring core ([[VideoOps.videoDupSegments]]);
    //        clips sharing ≥ `videoDupMinFrames` aligned frames pair,
    //        higher id drops.
    //     One decode pass per arm over asset-bearing in-play docs;
    //     docs without an asset row pass untouched. All None → empty
    //     drop set; a single arm keeps its exchange-free drop relation
    //     (no distinct added), so the prior image-only shape is
    //     unchanged.
    def inPlayAssets(assets: DataFrame): DataFrame =
      assets.select(col(idCol).as("doc_id"), col("content"))
        .join(s1m.select(id.as("doc_id")), Seq("doc_id"), "left_semi")
    // independent modality arms over independent asset relations — run
    // the decode+pair jobs concurrently ([[parEval]]; the image arm's
    // two checkpoints stay sequential inside its own thunk)
    val Seq(imageDupDrops, audioDupDrops, videoDupDrops) = parEvalOpt(Seq(
      mediaDup.map { md => () =>
        val inPlay = inPlayAssets(md)
        // ONE decode pass feeds both the band join (ahash) and the keep
        // rule (checksum) — see [[MediaOps.perceptualChecksums]]: decode
        // dominates this arm, and the former hashes-then-decodeImages
        // shape paid it twice per asset
        val hx = MediaOps.perceptualChecksums(inPlay, mediaCodec).toDF()
          .filter(col("ok")).localCheckpoint(eager = true)
        val pairs = DedupOps.simhashPairsFromSigs(
            hx.select(col("doc_id").as("doc"), col("ahash").as("sig")),
            mediaDupMaxDist)
          .localCheckpoint(eager = true)
        val scores = hx.select(col("doc_id"), col("checksum"))
        DedupOps.qualityKeepClusters(inPlay.select(col("doc_id")), pairs, scores,
            "doc_id", scoreCol = "checksum")
          .filter(!col("kept"))
          .select(col("doc_id").as("__mdup_drop")).localCheckpoint(eager = true)
      },
      audioDup.map { ad => () =>
        MediaOps.audioDupPairs(inPlayAssets(ad), audioCodec, audioDupMaxDist)
          .select(col("doc_b").as("__mdup_drop")).distinct()
          .localCheckpoint(eager = true)
      },
      videoDup.map { vd => () =>
        VideoOps.videoDupSegments(inPlayAssets(vd), videoContainer, mediaCodec,
            videoDupMinFrames)
          .select(col("doc_b").as("__mdup_drop")).distinct()
          .localCheckpoint(eager = true)
      }))
    val mediaDupDrops =
      Seq(imageDupDrops, audioDupDrops, videoDupDrops).flatten match {
        case Nil => docs.limit(0).select(id.as("__mdup_drop"))
        case one :: Nil => one
        case several => several.reduce(_ union _).distinct()
      }
    val drops3 = drops2.union(dropCol(mediaDupDrops))
    val s1d = minusDrops(docs, id, drops3)

    // 1.7 (optional, r19) trained LANGUAGE gate — the CCNet discipline:
    //     lang-id runs FIRST among the text-reading stages, so a
    //     monolingual curation lane never lets other languages feed its
    //     gram/span/near-dup statistics. `langModel` is the per-snapshot
    //     multiclass char-trigram NB artifact ([[TextOps.langNbFit]],
    //     stored/loaded through [[SnapshotStore]] as (lang, k, v) rows);
    //     survivors whose argmax language falls outside `langAllow` drop
    //     as `wrong_lang`. Scoring is one trigram pass + a broadcast
    //     join on C·buckets integer rows — per-row scan work, no text
    //     in any exchange. A doc with no trigram carries no evidence
    //     and passes through (it dies as `empty` downstream). None →
    //     empty drop set, prior shape byte-identical.
    val langDrops = langModel.map { lm =>
      TextOps.langNbPredict(lm, s1d.select(id, col(textCol)), idCol, textCol)
        .filter(!col("pred_lang").isin(langAllow: _*))
        .select(col(idCol).as("__lang_drop")).localCheckpoint(eager = true)
    }.getOrElse(docs.limit(0).select(id.as("__lang_drop")))
    val drops4 = drops3.union(dropCol(langDrops))
    val s1lg = minusDrops(docs, id, drops4)

    // 1.8 (optional, r19) Gopher/C4 heuristic RULE gate
    //     ([[QualityFilters.ruleReport]]): the cheapest text stage — a
    //     per-row scan over raw text, no model, no shuffle — so it runs
    //     right after the language gate to shrink every pairwise stage's
    //     candidate set. Judged on RAW text (the published rule sets are
    //     page-level filters over the crawl, not over span-cleaned
    //     output); failures drop as `rule_filtered`, each rule's verdict
    //     one audit `GROUP BY` away via the standalone report. None →
    //     empty drop set, prior shape byte-identical.
    val ruleDrops = ruleParams.map { rp =>
      // single-expression verdict (QualityFilters.rulePass): the pushed
      // filter evaluates the byte scan ONCE per row — filtering the
      // ruleReport's rule_pass would inline graft_rule_stats per rule
      // conjunct (FilterExec has no subexpression elimination)
      s1lg.select(id, col(textCol))
        .filter(!QualityFilters.rulePass(col(textCol), rp))
        .select(id.as("__rule_drop")).localCheckpoint(eager = true)
    }.getOrElse(docs.limit(0).select(id.as("__rule_drop")))
    val drops5 = drops4.union(dropCol(ruleDrops))
    val s1rl = minusDrops(docs, id, drops5)

    // 1.75 (optional, r16) benchmark decontamination: exact/media
    //     survivors sharing a k-gram shingle with the benchmark
    //     ([[Decontaminate.contaminatedIds]] — membership implies every
    //     span hit too, a ≥ minSpan verbatim run shares its k-grams) OR
    //     whose embedding reaches `contamCosTau` cosine against any
    //     benchmark vector (the paraphrase grain) drop as `contaminated`
    //     BEFORE the text stages — eval-suite text must not feed gram
    //     statistics or survive into training data. The benchmark is an
    //     eval suite: fixed and small, so the cosine scan is
    //     benchmark-bounded map-side work (the [[Decontaminate.report]]
    //     contract). None → empty drop set, prior shape byte-identical.
    val contamDrops = benchmark.map { b =>
      // r22: ONE materialized leaf feeds the stage's two grains — `s1rl`
      // is a lazy anti-join chain over the docs scan, and the former
      // shape executed that whole chain twice (once inside the n-gram
      // scan's job, once inside the semantic semi-join's). Text mass is
      // survivor-bounded — the same order the `cleaned` checkpoint below
      // already materializes.
      val inPlay = s1rl.select(id, col(textCol)).localCheckpoint(eager = true)
      val ng = Decontaminate.contaminatedIds(
          inPlay, b.select(col(idCol), col(textCol)),
          idCol, textCol, contamNgramK)
        .select(col("doc"))
      val bEmb = benchmarkEmb.getOrElse(sys.error(
        "benchmark decontamination needs benchmarkEmb for the semantic grain"))
      val sem = embeddings
        .join(inPlay.select(id.as("__cid")), col(vecIdCol) === col("__cid"), "left_semi")
        .select(col(vecIdCol).as("doc"), col(vecCol).as("__cvec"),
          SimilarityOps.norm(col(vecCol)).as("__cnrm"))
        .crossJoin(bEmb.select(col(vecCol).as("__bvec"),
          SimilarityOps.norm(col(vecCol)).as("__bnrm")))
        .withColumn("__cos", SimilarityOps.dot(col("__cvec"), col("__bvec")) /
          (col("__cnrm") * col("__bnrm")))
        .groupBy("doc").agg(max(col("__cos")).as("__mc"))
        .filter(col("__mc") >= contamCosTau)
        .select(col("doc"))
      ng.union(sem).distinct()
        .select(col("doc").as("__contam_drop")).localCheckpoint(eager = true)
    }.getOrElse(docs.limit(0).select(id.as("__contam_drop")))
    val drops6 = drops5.union(dropCol(contamDrops))
    val s1c = minusDrops(docs, id, drops6)

    // 2. span removal over exact survivors (blank docs fall out here and
    //    are decided `empty` in the assembly, matching removeDuplicatedSpans'
    //    non-blank output contract); a doc whose every token sat in a
    //    duplicated span is `empty` too
    val cleaned = SpanDedup.removeDuplicatedSpans(s1c, idCol, textCol,
      spanK, minSpan, maxGramOccurrences).localCheckpoint(eager = true)
    val s2 = cleaned.filter(col("kept_tokens") > 0)

    // 2.5 (optional, r16) trained-quality gate: the NB seed-vs-crawl
    //     classifier ([[TextOps.seedCrawlNbScores]]) trained on raw doc
    //     slices, scoring the span survivors' CLEANED text; docs whose
    //     integer class log-odds fall below `minNbScoreU` drop as
    //     `low_quality` BEFORE the pairwise stages — a per-row scan+
    //     broadcast-join cut is the cheapest stage, so it runs first to
    //     shrink the near-dup/semantic candidate sets. None → disabled:
    //     the drop side is an empty relation and the decision class never
    //     fires (q112's shape and output are byte-identical).
    //     Two drop semantics: `lowQualityFraction > 0` drops the WORST
    //     fraction by score (rank-based budgeting, the CCNet-style cut —
    //     robust to the score distribution shifting with corpus size);
    //     otherwise `minNbScoreU` is an absolute class-log-odds floor
    //     (score > 0 = "more seed-like than crawl-like"). The rank is a
    //     two-level prefix scan (the Sharding.tokenShards shape): range
    //     partition on (score, id), local row_number, P-row offset
    //     broadcast — never a global single-task window.
    val qualityDrops = seedFilter.map { sf =>
      val crawl = crawlFilter.getOrElse(!sf)
      // checkpointed so the rank path's count() and its rank plan read
      // one materialized leaf instead of re-running the scoring pass
      // widenIfNarrow: the NB feature pass (md5 per uni/bigram) is the
      // one hashing-scale scan of this stage's text — see the helper doc
      val scored = TextOps.seedCrawlNbScores(docs.filter(sf), docs.filter(crawl),
          widenIfNarrow(s2.select(id, col("cleaned_text").as(textCol))),
          idCol, textCol, nbBuckets)
        .select(id, col("nb_score_u")).localCheckpoint(eager = true)
      val drops =
        if (lowQualityFraction > 0.0) {
          val k = math.floor(lowQualityFraction * scored.count()).toLong
          if (k <= 0L) scored.limit(0).select(id)
          else TextOps.rankByScore(scored, col("nb_score_u"), id)
            .filter(col("__grk") <= k).select(id)
        } else scored.filter(col("nb_score_u") < minNbScoreU).select(id)
      drops.select(id.as("__quality_drop")).localCheckpoint(eager = true)
    }.getOrElse(docs.limit(0).select(id.as("__quality_drop")))
    val dropsQ = dropCol(qualityDrops)
    val s2q = minusDrops(s2, id, dropsQ)

    // 3. near dedup on the cleaned text — the text duplicates must be
    //    judged on what stage 2 kept, not the raw crawl
    val nearDrops = DedupOps.jaccardPairs(s2q, idCol, "cleaned_text",
        shingleK, nearDupThreshold, maxShingleDF)
      .select(col("doc_b").as("__near_drop")).distinct().localCheckpoint(eager = true)
    val dropsQN = dropsQ.union(dropCol(nearDrops))
    val s3 = minusDrops(s2, id, dropsQN)

    // 4. semantic dedup over the surviving docs' embeddings (centroids
    //    fit on the survivor slice — the corpus the stage actually sees)
    // checkpointed too: fit's init + per-iteration passes and semDedup's
    // self-join sides otherwise re-run the survivor semi-join 5×
    val emb3 = embeddings.join(s3.select(id.as("__sid")),
        col(vecIdCol) === col("__sid"), "left_semi")
      .localCheckpoint(eager = true)
    // graceful degradation when the gate cascade shrinks the embedded
    // survivor set below semK (a heavy rule/lang/quota configuration can
    // legally do this): fit on min(k, survivors) clusters, or skip the
    // stage when nothing embedded survives — a crash here would take a
    // 100 TB run down at its LAST stage. The count is a metadata read on
    // the checkpointed leaf. Fixtures with survivors >= semK (every
    // pinned oracle) are byte-identical: min() is the identity there.
    val nEmb3 = emb3.count()
    val semDrops = (if (nEmb3 == 0L) emb3.select(col(vecIdCol).as("id"))
      else {
        val cent = KMeansOps.fit(emb3, vecIdCol, vecCol,
          math.min(semK.toLong, nEmb3).toInt, semIters)
        KMeansOps.semDedup(emb3, vecIdCol, vecCol, cent, semTau)
          .filter(!col("kept")).select(col("id"))
      }).select(col("id").as("__sem_drop"))
      .localCheckpoint(eager = true)
    val s4 = minusDrops(s2, id, dropsQN.union(dropCol(semDrops)))

    // 5. per-source token quota over cleaned token counts
    val s4src = s4.join(docs.select(id, col(sourceCol)), Seq(idCol))
    val quotaDrops = QuotaSample.tokenQuota(s4src, sourceCol, idCol,
        "cleaned_text", tokenBudget)
      .filter(!col("kept")).select(id.as("__quota_drop"))
      .localCheckpoint(eager = true)

    // assembly: every input doc, one decision, survivor fingerprint.
    // ONE drop-verdict join (r21) instead of ten: each drop leaf is
    // tagged with its stage's PRIORITY, the union aggregates to the
    // min priority per id (exactly the old when-chain's first-match
    // order — a doc in several sets reads its earliest stage), and the
    // docs scan joins that single relation plus the cleaned leaf. The
    // former chain of ten sequential left joins built ten broadcast
    // relations per run (and at scale would have shuffled the doc
    // relation up to ten times); this is two. The `empty` class keeps
    // its slot BETWEEN contaminated (5) and low_quality (6): a doc
    // dropped at a stage ≤ 5 never reached span removal (no cleaned
    // row), so the ≤ 5 guard must fire before the cleaned-null check,
    // and quality/near/sem/quota docs all carry kept_tokens > 0 rows.
    val dropTags = Seq(
      exactDrops -> 0, mediaDrops -> 1, mediaDupDrops -> 2, langDrops -> 3,
      ruleDrops -> 4, contamDrops -> 5, qualityDrops -> 6, nearDrops -> 7,
      semDrops -> 8, quotaDrops -> 9)
    val dropVerdict = dropTags.map { case (df, p) =>
        df.select(col(df.columns.head).as("__d_id"), lit(p).as("__d_p"))
      }.reduce(_ union _)
      .groupBy("__d_id").agg(min("__d_p").as("__d_p"))
    val dropName = when(col("__d_p") === 0, "exact_dup")
      .when(col("__d_p") === 1, "bad_media")
      .when(col("__d_p") === 2, "media_dup")
      .when(col("__d_p") === 3, "wrong_lang")
      .when(col("__d_p") === 4, "rule_filtered")
      .when(col("__d_p") === 5, "contaminated")
      .when(col("__d_p") === 6, "low_quality")
      .when(col("__d_p") === 7, "near_dup")
      .when(col("__d_p") === 8, "sem_dup")
      .when(col("__d_p") === 9, "over_quota")
    docs.select(id, col(sourceCol))
      .join(dropVerdict, id === col("__d_id"), "left")
      .join(cleaned.select(id, col("kept_tokens"), col("removed_tokens"),
        col("cleaned_text")), Seq(idCol), "left")
      .withColumn("decision",
        when(col("__d_p") <= 5, dropName)
          .when(col("cleaned_text").isNull || col("kept_tokens") === 0L, "empty")
          .when(col("__d_p").isNotNull, dropName)
          .otherwise("kept"))
      .select(id, col(sourceCol), col("decision"),
        coalesce(col("removed_tokens"), lit(0L)).as("removed_tokens"),
        when(col("decision") === "kept", col("kept_tokens")).as("n_tokens"),
        when(col("decision") === "kept",
          md5(outputText(col("cleaned_text"), piiRedactOutput).cast("binary")))
          .as("final_md5"))
  }

  /** The released text of a kept document: identity, or PII-redacted
    * ([[Privacy.redact]] — email → IPv4 → phone, the q62 pattern tier)
    * when the caller opts in. Redaction is an OUTPUT transform only:
    * every stage judges the original text (a masked token must not
    * change dedup/gram statistics), and counts stay pre-redaction. */
  private def outputText(cleaned: org.apache.spark.sql.Column,
                         piiRedact: Boolean): org.apache.spark.sql.Column =
    if (piiRedact) Privacy.redact(cleaned) else cleaned

  /** INCREMENTAL curation — [[curateFull]]'s ingest-time twin: a new
    * crawl batch judged against the ADMITTED corpus, stage by stage with
    * the cross/incremental operator variants (history is immutable —
    * only batch rows are decided):
    *
    *   1. exact-vs-history ([[IncrementalDedup.dedupAgainstHistory]]:
    *      bloom-probe + exact verify — exactly the anti-join),
    *   1.5. (optional, `media`/`video`/`audio`) media-integrity gate at
    *      ingest grain ([[mediaGateDrops]], batch docs only) →
    *      `bad_media`,
    *   2. cross-span CONTAMINATION removal ([[SpanDedup.removeCrossSpans]]:
    *      batch copies of ≥ minSpan verbatim history runs are cut; a
    *      batch doc cleaned to nothing is `empty`),
    *   2.5. (optional, `nbModel`) trained-quality gate against the
    *      snapshot's stored NB model — batch docs scoring below
    *      `minNbScoreU` on their CLEANED text → `low_quality`,
    *   3. cross near-dup on the CLEANED batch text vs history
    *      ([[DedupOps.crossMinhashPairs]]),
    *   4. cross semantic dedup ([[KMeansOps.incrementalSemDedup]] against
    *      centroids fit on — or passed in from — the history snapshot).
    *
    * One row per BATCH document: (id, decision ∈ {exact_dup, bad_media,
    * media_dup, wrong_lang, rule_filtered, contaminated, empty,
    * low_quality, near_dup, sem_dup, kept}, removed_tokens, n_tokens,
    * final_md5).
    * Intra-batch dedup and quotas are deliberately out of scope — run
    * [[curateFull]] over the admitted batch for those; this operator is
    * the contamination gate against history.
    *
    * Snapshot artifacts: `historyBloom` (the q64 lifecycle) and
    * `centroids` (the q101/q103 lifecycle) are per-snapshot builds a
    * deployment loads from [[SnapshotStore]]; None builds them inline.
    * Per-batch cost = batch passes + equi-joins into history relations —
    * never batch × history. Stage outputs are eagerly checkpointed (the
    * [[curateFull]] plan-growth rationale). */
  def curateIncremental(history: DataFrame, batch: DataFrame,
                        embeddings: DataFrame,
                        idCol: String, textCol: String,
                        vecIdCol: String = "vec_id", vecCol: String = "embedding",
                        nearDupThreshold: Double = 0.9, shingleK: Int = 3,
                        maxShingleDF: Int = 1000,
                        spanK: Int = 8, minSpan: Int = 20,
                        maxGramOccurrences: Int = 1000,
                        semK: Int = 8, semIters: Int = 2, semTau: Double = 0.35,
                        historyBloom: Option[Array[Byte]] = None,
                        centroids: Option[Array[Array[Double]]] = None,
                        keepCleanedText: Boolean = false,
                        nbModel: Option[TextOps.NbModel] = None,
                        minNbScoreU: Long = 0L,
                        benchmark: Option[DataFrame] = None,
                        benchmarkEmb: Option[DataFrame] = None,
                        contamNgramK: Int = 13,
                        contamCosTau: Double = 0.4,
                        media: Option[DataFrame] = None,
                        mediaCodec: MediaOps.ImageCodec = MediaOps.ImageIoCodec,
                        mediaGrid: Int = 2,
                        minMeanLum: Double = 5.0, maxMeanLum: Double = 250.0,
                        mediaDupHistory: Option[DataFrame] = None,
                        mediaDupBatch: Option[DataFrame] = None,
                        mediaDupMaxDist: Int = 2,
                        audioDupHistory: Option[DataFrame] = None,
                        audioDupBatch: Option[DataFrame] = None,
                        audioDupMaxDist: Int = 2,
                        videoDupHistory: Option[DataFrame] = None,
                        videoDupBatch: Option[DataFrame] = None,
                        videoDupMinFrames: Int = 6,
                        video: Option[DataFrame] = None,
                        videoContainer: VideoOps.VideoContainer = VideoOps.GvidContainer,
                        videoEvery: Int = 1,
                        audio: Option[DataFrame] = None,
                        audioCodec: MediaOps.AudioCodec = MediaOps.JavaSoundCodec,
                        langModel: Option[TextOps.LangNbModel] = None,
                        langAllow: Seq[String] = Seq("en"),
                        ruleParams: Option[QualityFilters.RuleParams] = None,
                        piiRedactOutput: Boolean = false,
                        historyFps: Option[DataFrame] = None): DataFrame = {
    val id = col(idCol)

    // 1. exact vs history (bloom candidates + exact verify = the anti-join).
    //    `historyFps` (one column `fp`) extends the drop set with
    //    PRE-redaction fingerprints of admitted docs whose persisted text
    //    is PII-masked (r19 advice): a re-ingested duplicate of an admitted
    //    PII-bearing doc must still read exact_dup even though the store's
    //    released text no longer equals it. The relation is bounded by the
    //    admitted-history row count (16 B digests, no text), so the join
    //    broadcasts at typical history sizes and shuffles digests, never
    //    documents, beyond that.
    val s1base = IncrementalDedup.dedupAgainstHistory(batch, history, idCol,
      textCol, historyBlob = historyBloom)
    val s1 = historyFps.fold(s1base) { fps =>
        s1base.join(fps.select(col("fp").as("__hist_ufp")),
          TextOps.fingerprint(col(textCol)) === col("__hist_ufp"), "left_anti")
      }
      .localCheckpoint(eager = true)

    // 1.5 (optional, r16) media-integrity gate — [[curateFull]]'s stage
    //     at ingest grain: only BATCH docs get their assets decoded
    //     (history was gated at its own admission), all three modality
    //     arms via [[mediaGateDrops]], drops as `bad_media` before any
    //     text stage. All None → empty drop set, q115 byte-identical.
    val mediaDrops = mediaGateDrops(s1, idCol,
      media, mediaCodec, mediaGrid, minMeanLum, maxMeanLum,
      video, videoContainer, videoEvery, audio, audioCodec,
      batch.limit(0).select(id.as("__media_drop")))
    // cumulative drop union per stage input (r21) — the curateFull shape:
    // one anti-join from the s1 leaf instead of a growing chain
    val drops1 = dropCol(mediaDrops)
    val s1v = minusDrops(s1, id, drops1)

    // 1.6 (optional, r17; r19: three modality arms) incremental
    //     perceptual MEDIA dedup — the ingest twin of [[curateFull]]'s
    //     stage 1.6 under the incremental keep rule: a batch doc drops
    //     as `media_dup` when its asset is a perceptual duplicate of
    //     ANY history asset (history is immutable — its copy survives)
    //     or of a SMALLER-id batch mate's. Per arm:
    //      - image: aHash bands, candidates from the banded cross join
    //        ([[DedupOps.simhashCrossPairsFromSigs]] — the history band
    //        relation is snapshot-persistable, so per-batch cost is the
    //        batch's bands only),
    //      - audio: envelope hash ([[MediaOps.audioHashes]]) through
    //        the same cross + batch-mate band joins,
    //      - video: per-frame hashes through the exact-substring core's
    //        cross twin ([[SpanDedup.crossSpansFromGrams]], k = 1) for
    //        history segments and its self form for batch mates —
    //        ≥ `videoDupMinFrames` aligned shared frames drop the batch
    //        copy.
    //     Arms judge the SAME in-play batch independently; drops
    //     union-DISTINCT. Each arm needs BOTH its history and batch
    //     sides; all None → empty drop set, prior shape byte-identical.
    def inPlayBatchAssets(assets: DataFrame): DataFrame =
      assets.select(col(idCol).as("doc_id"), col("content"))
        .join(s1v.select(id.as("doc_id")), Seq("doc_id"), "left_semi")
    // arm argument validation stays on the calling thread; the arm BODIES
    // (independent decode/hash/pair jobs) run concurrently ([[parEval]])
    val imageDupThunk = (mediaDupHistory, mediaDupBatch) match {
      case (Some(hist), Some(ba)) => Some(() => {
        val hb = MediaOps.perceptualHashes(inPlayBatchAssets(ba), mediaCodec).toDF()
          .filter(col("ok"))
          .select(col("doc_id").as("doc"), col("ahash").as("sig"))
          .localCheckpoint(eager = true)
        val hh = MediaOps.perceptualHashes(
            hist.select(col(idCol).as("doc_id"), col("content")), mediaCodec).toDF()
          .filter(col("ok"))
          .select(col("doc_id").as("doc"), col("ahash").as("sig"))
        val cross = DedupOps.simhashCrossPairsFromSigs(hb, hh, mediaDupMaxDist)
          .select(col("doc_a"))
        val mates = DedupOps.simhashPairsFromSigs(hb, mediaDupMaxDist)
          .select(col("doc_b").as("doc_a"))
        cross.union(mates).distinct()
          .select(col("doc_a").as("__mdup_drop")).localCheckpoint(eager = true)
      })
      case (None, None) => None
      case _ => sys.error(
        "incremental media dedup needs BOTH mediaDupHistory and mediaDupBatch")
    }
    val audioDupThunk = (audioDupHistory, audioDupBatch) match {
      case (Some(hist), Some(ba)) => Some(() => {
        val hb = MediaOps.audioHashes(inPlayBatchAssets(ba), audioCodec).toDF()
          .filter(col("ok"))
          .select(col("doc_id").as("doc"), col("ahash").as("sig"))
          .localCheckpoint(eager = true)
        val hh = MediaOps.audioHashes(
            hist.select(col(idCol).as("doc_id"), col("content")), audioCodec).toDF()
          .filter(col("ok"))
          .select(col("doc_id").as("doc"), col("ahash").as("sig"))
        val cross = DedupOps.simhashCrossPairsFromSigs(hb, hh, audioDupMaxDist)
          .select(col("doc_a"))
        val mates = DedupOps.simhashPairsFromSigs(hb, audioDupMaxDist)
          .select(col("doc_b").as("doc_a"))
        cross.union(mates).distinct()
          .select(col("doc_a").as("__mdup_drop")).localCheckpoint(eager = true)
      })
      case (None, None) => None
      case _ => sys.error(
        "incremental audio dedup needs BOTH audioDupHistory and audioDupBatch")
    }
    val videoDupThunk = (videoDupHistory, videoDupBatch) match {
      case (Some(hist), Some(ba)) => Some(() => {
        // frame-hash relations: batch hashed ONCE (feeds both the cross
        // and the mate join), history as its own relation — a snapshot-
        // persistable artifact, like the image band relation
        val bg = VideoOps.frameHashes(inPlayBatchAssets(ba), videoContainer,
          mediaCodec).localCheckpoint(eager = true)
        val hg = VideoOps.frameHashes(
          hist.select(col(idCol).as("doc_id"), col("content")),
          videoContainer, mediaCodec)
        val cross = SpanDedup.crossSpansFromGrams(hg, bg, k = 1,
            minSpan = videoDupMinFrames, maxGramOccurrences = 1000)
          .select(col("right_id").as("doc_a"))
        val mates = SpanDedup.duplicatedSpansFromGrams(bg, k = 1,
            minSpan = videoDupMinFrames, maxGramOccurrences = 1000)
          .select(col("doc_b").as("doc_a"))
        cross.union(mates).distinct()
          .select(col("doc_a").as("__mdup_drop")).localCheckpoint(eager = true)
      })
      case (None, None) => None
      case _ => sys.error(
        "incremental video dedup needs BOTH videoDupHistory and videoDupBatch")
    }
    val Seq(imageDupDrops, audioDupDrops, videoDupDrops) =
      parEvalOpt(Seq(imageDupThunk, audioDupThunk, videoDupThunk))
    val mediaDupDrops =
      Seq(imageDupDrops, audioDupDrops, videoDupDrops).flatten match {
        case Nil => batch.limit(0).select(id.as("__mdup_drop"))
        case one :: Nil => one
        case several => several.reduce(_ union _).distinct()
      }
    val drops2 = drops1.union(dropCol(mediaDupDrops))
    val s1pd = minusDrops(s1, id, drops2)

    // 1.7 (optional, r19) trained LANGUAGE gate at ingest grain —
    //     [[curateFull]]'s stage 1.7 with the per-SNAPSHOT model
    //     artifact (fit on the admitted corpus's labels via
    //     [[TextOps.langNbFit]], the stored-model discipline of the NB
    //     quality gate): batch docs whose argmax language falls outside
    //     `langAllow` drop as `wrong_lang` before any history stage.
    //     None → empty drop set, prior shape byte-identical.
    val langDrops = langModel.map { lm =>
      TextOps.langNbPredict(lm, s1pd.select(id, col(textCol)), idCol, textCol)
        .filter(!col("pred_lang").isin(langAllow: _*))
        .select(col(idCol).as("__lang_drop")).localCheckpoint(eager = true)
    }.getOrElse(batch.limit(0).select(id.as("__lang_drop")))
    val drops3 = drops2.union(dropCol(langDrops))
    val s1lg = minusDrops(s1, id, drops3)

    // 1.8 (optional, r19) Gopher/C4 heuristic RULE gate at ingest grain
    //     — [[curateFull]]'s stage 1.8 judged per batch: the rule set is
    //     a fixed page-level contract (thresholds travel with the
    //     deployment, not the data), so admission decisions can't drift
    //     with batch composition by construction. Raw batch text,
    //     failures drop as `rule_filtered` before any history stage.
    //     None → empty drop set, prior shape byte-identical.
    val ruleDrops = ruleParams.map { rp =>
      // single-expression verdict — see curateFull's stage 1.8 note
      s1lg.select(id, col(textCol))
        .filter(!QualityFilters.rulePass(col(textCol), rp))
        .select(id.as("__rule_drop")).localCheckpoint(eager = true)
    }.getOrElse(batch.limit(0).select(id.as("__rule_drop")))
    val drops4 = drops3.union(dropCol(ruleDrops))
    val s1rl = minusDrops(s1, id, drops4)

    // 1.9 (optional, r16) eval-suite decontamination — the ingest twin
    //     of [[curateFull]]'s stage 1.75, judged per batch against the
    //     SAME fixed benchmark (k-gram membership implies span hits; the
    //     cosine grain catches paraphrases). History contamination is
    //     stage 2's cross-span job; this stage guards the eval suite,
    //     whose text must not enter the corpus store at any grain.
    //     None → empty drop set, prior shape byte-identical.
    val contamDrops = benchmark.map { b =>
      // r22: ONE materialized leaf feeds the stage's two grains (the
      // curateFull stage's rationale — the former shape executed the
      // s1rl anti-join chain once per grain). widenIfNarrow: the k-gram
      // shingle pass (hash per window) is a hashing-scale scan — the
      // helper's case; the leaf's own partition count is now the honest
      // probe (it IS materialized).
      val inPlay = s1rl.select(id, col(textCol)).localCheckpoint(eager = true)
      val ng = Decontaminate.contaminatedIds(
          widenIfNarrow(inPlay),
          b.select(col(idCol), col(textCol)),
          idCol, textCol, contamNgramK)
        .select(col("doc"))
      val bEmb = benchmarkEmb.getOrElse(sys.error(
        "benchmark decontamination needs benchmarkEmb for the semantic grain"))
      val sem = embeddings
        .join(inPlay.select(id.as("__cid")), col(vecIdCol) === col("__cid"), "left_semi")
        .select(col(vecIdCol).as("doc"), col(vecCol).as("__cvec"),
          SimilarityOps.norm(col(vecCol)).as("__cnrm"))
        .crossJoin(bEmb.select(col(vecCol).as("__bvec"),
          SimilarityOps.norm(col(vecCol)).as("__bnrm")))
        .withColumn("__cos", SimilarityOps.dot(col("__cvec"), col("__bvec")) /
          (col("__cnrm") * col("__bnrm")))
        .groupBy("doc").agg(max(col("__cos")).as("__mc"))
        .filter(col("__mc") >= contamCosTau)
        .select(col("doc"))
      ng.union(sem).distinct()
        .select(col("doc").as("__contam_drop")).localCheckpoint(eager = true)
    }.getOrElse(batch.limit(0).select(id.as("__contam_drop")))
    val drops5 = drops4.union(dropCol(contamDrops))
    val s1c = minusDrops(s1, id, drops5)

    // 2. cross-span contamination removal vs history
    val cleaned = SpanDedup.removeCrossSpans(history, s1c, idCol, textCol,
      spanK, minSpan, maxGramOccurrences).localCheckpoint(eager = true)
    val s2 = cleaned.filter(col("kept_tokens") > 0)

    // 2.5 (optional, r16) trained-quality gate against the SNAPSHOT
    //     model: `nbModel` is the per-snapshot artifact (fit on the
    //     admitted corpus's seed/crawl slices via
    //     [[TextOps.seedCrawlNbFit]], stored/loaded through
    //     [[SnapshotStore]] as long pairs) — the ingest stream scores
    //     every batch against the SAME fixed model, so admission
    //     decisions never drift with batch composition (the centroid
    //     discipline, applied to quality). Absolute threshold here (not
    //     the rank cut): a per-batch quantile would admit a different
    //     quality floor per batch. None → disabled, q115 byte-identical.
    val qualityDrops = nbModel.map { m =>
      TextOps.nbScore(m,
          widenIfNarrow(s2.select(id, col("cleaned_text").as(textCol))),
          idCol, textCol)
        .filter(col("nb_score_u") < minNbScoreU)
        .select(id.as("__quality_drop")).localCheckpoint(eager = true)
    }.getOrElse(batch.limit(0).select(id.as("__quality_drop")))
    val dropsQ = dropCol(qualityDrops)
    val s2q = minusDrops(s2, id, dropsQ)

    // 3. cross near-dup: history's raw text vs the batch's CLEANED text
    //    (both sides under crossMinhashPairs' shared union hot list)
    val nearDrops = DedupOps.crossMinhashPairs(
        history.select(id, col(textCol)),
        s2q.select(id, col("cleaned_text").as(textCol)),
        idCol, textCol, shingleK, nearDupThreshold, maxShingleDF = maxShingleDF)
      .select(col("doc_b").as("__near_drop")).distinct()
      .localCheckpoint(eager = true)
    val s3 = minusDrops(s2, id, dropsQ.union(dropCol(nearDrops)))

    // 4. cross semantic dedup: batch survivors' embeddings vs the history
    //    snapshot's (centroids fit on history — the stored-artifact side)
    // two independent embedding slices — materialize concurrently
    val Seq(embHist, embBatch) = parEval(Seq(
      () => embeddings.join(history.select(id.as("__hid")),
          col(vecIdCol) === col("__hid"), "left_semi")
        .localCheckpoint(eager = true),
      () => embeddings.join(s3.select(id.as("__sid")),
          col(vecIdCol) === col("__sid"), "left_semi")
        .localCheckpoint(eager = true)))
    // inline-fit clamp: same graceful degradation as curateFull's stage
    // 4 — a small admitted history must not crash the ingest gate. A
    // provided snapshot artifact (the production path) skips the count.
    val cent = centroids.getOrElse {
      val nHist = embHist.count()
      if (nHist == 0L) Array.empty[Array[Double]]
      else KMeansOps.fit(embHist, vecIdCol, vecCol,
        math.min(semK.toLong, nHist).toInt, semIters)
    }
    // empty history (no centroids, nothing admitted yet) => nothing to
    // dup against: the drop set is EMPTY, every batch vector survives
    val semDrops = (if (cent.isEmpty) embBatch.limit(0).select(col(vecIdCol).as("id"))
      else KMeansOps.incrementalSemDedup(embHist, embBatch,
          vecIdCol, vecCol, cent, semTau)
        .filter(!col("kept")).select(col("id")))
      .select(col("id").as("__sem_drop"))
      .localCheckpoint(eager = true)

    // assembly over the batch. `keepCleanedText` adds the survivor text
    // itself (kept rows only) — what an ingest sink APPENDS to the
    // corpus store ([[graft.streaming.StreamingDedup.curateSink]]);
    // the q115 oracle shape carries only its md5.
    // one drop-verdict join (r21) — the curateFull assembly shape; the
    // admitted (s1) join keeps its separate slot because its verdict
    // reads from NULL (not-admitted = exact_dup), and `empty` keeps its
    // place between contaminated (5) and low_quality (6)
    val dropTags = Seq(
      mediaDrops -> 1, mediaDupDrops -> 2, langDrops -> 3,
      ruleDrops -> 4, contamDrops -> 5, qualityDrops -> 6,
      nearDrops -> 7, semDrops -> 8)
    val dropVerdict = dropTags.map { case (df, p) =>
        df.select(col(df.columns.head).as("__d_id"), lit(p).as("__d_p"))
      }.reduce(_ union _)
      .groupBy("__d_id").agg(min("__d_p").as("__d_p"))
    val dropName = when(col("__d_p") === 1, "bad_media")
      .when(col("__d_p") === 2, "media_dup")
      .when(col("__d_p") === 3, "wrong_lang")
      .when(col("__d_p") === 4, "rule_filtered")
      .when(col("__d_p") === 5, "contaminated")
      .when(col("__d_p") === 6, "low_quality")
      .when(col("__d_p") === 7, "near_dup")
      .when(col("__d_p") === 8, "sem_dup")
    val ann = batch.select(id)
      .join(s1.select(id.as("__adm")), id === col("__adm"), "left")
      .join(dropVerdict, id === col("__d_id"), "left")
      .join(cleaned.select(id, col("kept_tokens"), col("removed_tokens"),
        col("cleaned_text")), Seq(idCol), "left")
      .withColumn("decision",
        when(col("__adm").isNull, "exact_dup")
          .when(col("__d_p") <= 5, dropName)
          .when(col("cleaned_text").isNull || col("kept_tokens") === 0L, "empty")
          .when(col("__d_p").isNotNull, dropName)
          .otherwise("kept"))
    val baseCols = Seq(id, col("decision"),
      coalesce(col("removed_tokens"), lit(0L)).as("removed_tokens"),
      when(col("decision") === "kept", col("kept_tokens")).as("n_tokens"),
      when(col("decision") === "kept",
        md5(outputText(col("cleaned_text"), piiRedactOutput).cast("binary")))
        .as("final_md5"))
    if (!keepCleanedText) ann.select(baseCols: _*)
    else {
      // The kept docs' text columns are a PROJECTION of `ann`, not a join
      // (r22): the former base ⟕ kept-slice self-join re-executed the whole
      // assembly subtree (batch scan + drop-verdict aggregation + three
      // joins) once per side — per TRIGGER in the streaming curation sink.
      // `when(decision = 'kept', …)` gives the identical columns (NULL for
      // every non-kept row, exactly what the left join produced; batch ids
      // are unique so the join never fanned out) in the same single pass
      // that computes the verdict columns.
      //
      // Under redaction the released text is masked, so the kept slice
      // also carries `unredacted_fp` — the canonical fingerprint of the
      // PRE-redaction cleaned text — which is what a store feeds back as
      // `historyFps` so cross-batch exact dedup stays mask-invariant
      // (redaction is an output transform, never a dedup input).
      val kept = col("decision") === "kept"
      val extraCols =
        if (piiRedactOutput)
          Seq(when(kept, outputText(col("cleaned_text"), piiRedactOutput))
              .as("cleaned_text"),
            when(kept, TextOps.fingerprint(col("cleaned_text")))
              .as("unredacted_fp"))
        else Seq(when(kept, col("cleaned_text")).as("cleaned_text"))
      ann.select(baseCols ++ extraCols: _*)
    }
  }
}
