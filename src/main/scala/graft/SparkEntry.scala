package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query design note: the DuckDB oracle runs plain ANSI SQL (no sketch
  * extension), so every oracle-checked query is pinned to a regime where
  * the sketch answer is *exactly* the ANSI answer:
  *  - distinct-count sketches (hll/cpc/theta) over small-cardinality keys
  *    (≤ exact-mode capacity at the chosen lg_k);
  *  - quantile sketches (kll/quantiles/req) over filtered subsets with
  *    n ≤ K (pre-compaction exact mode), probed with inclusive-rank
  *    semantics that map 1:1 to `cume_dist()`;
  *  - frequent-items in exact mode (distinct items ≪ map capacity);
  *  - tdigest probed only at its exact points (endpoints, total weight).
  * Everything is deterministic at a fixed scale factor, so a local DuckDB
  * pre-check is conclusive for the driver's gate. The same queries still
  * *run* at any SF (bench uses sf0.1); only the exactness is SF-tuned.
  */
object SparkEntry
  extends SketchEntries with TextEntries with SimilarityEntries
    with RelationalEntries with StreamingEntries with DriftEntries
    with PipelineEntries {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    prep(spark, "/root/testdata/sf0.001")
    spark.sql(
      """SELECT l_returnflag,
        |       CAST(round(datasketch_hll_estimate(datasketch_hll(12, l_suppkey))) AS BIGINT) AS approx_suppliers,
        |       CAST(round(datasketch_theta_estimate(datasketch_theta(l_orderkey))) AS BIGINT) AS approx_orders,
        |       datasketch_kll_quantile(datasketch_kll(200, l_extendedprice), 0.5, true) AS median_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }


  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sketchQueries ++ textQueries ++ similarityQueries ++ relationalQueries ++
      streamingQueries ++ driftQueries ++ pipelineQueries

  /** What the benchmark times: `queries`, with oracle-portability shims
    * swapped for the production path. q37's `queries` entry computes token
    * hashes via md5 purely so an external ANSI engine can re-derive the
    * signatures bit-for-bit; a deployment runs the native xxhash64-based
    * `SimHash64` signatures (~4× cheaper per token). The two emit pair sets
    * under the same shared banding core (pinned in OperatorsSpec), so the
    * correctness gate still covers the benched shape. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    queries ++ benchOverrides

  /** Only the entries [[benchQueries]] swaps relative to [[queries]] —
    * exposed so plan-shape sweeps can cover each distinct plan exactly
    * once (queries returns fresh lambda instances per call, so the
    * overridden subset is not recoverable by value comparison). */
  def benchOverrides: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
      // q95's `queries` entry checks 5 anchors; the production path is
      // the full-table transform (one model pass + a per-row broadcast
      // probe) — bench the shape a feature pipeline actually runs
      "q95_rank_normalize" -> qd { spark =>
        import org.apache.spark.sql.functions._
        operators.RangeBounds.rankTransform(
            spark.table("events").filter(col("value").isNotNull),
            "value", "r", kllK = 400)
          .select(col("event_id"), col("r"))
      },
      "q37_simhash_pairs" -> qd { spark =>
        import org.apache.spark.sql.functions._
        operators.DedupOps.simhashPairs(spark.table("documents"), "doc_id", "text", maxDist = 3)
          .select(col("doc_a"), col("doc_b"), col("dist").cast("int").as("dist"))
          .orderBy("doc_a", "doc_b")
      },
      // q39/q45's `queries` entries are recall checks that also compute the
      // brute-force ground truth; the production paths a deployment runs
      // (and the plans that carry to 100 TB) are the LSH sides alone
      "q39_ann_lsh_topk" -> qd { spark =>
        import org.apache.spark.sql.functions._
        val emb = spark.table("embeddings")
        // probeDepth=2: the r14 operating point the recall contract is
        // measured at (0.80/0.80/0.93 across SFs) — bench what ships
        operators.SimilarityOps.lshTopK(
            emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding",
            k = 3, planes = 4, probeDepth = 2)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cosine"), 6).as("cosine"))
          .orderBy("query_id", "rank")
      },
      "q45_cosine_neardup_lsh" -> qd { spark =>
        import org.apache.spark.sql.functions._
        operators.SimilarityOps.cosineNearDupPairs(
            spark.table("embeddings"), "vec_id", "embedding", threshold = 0.3, planes = 4)
          .select(col("doc_a"), col("doc_b"), round(col("cosine"), 6).as("cosine"))
          .orderBy("doc_a", "doc_b")
      },
      // q66's `queries` entry mines pairs with an all-pairs nested-loop
      // join — the oracle-checkable ground truth (DuckDB re-derives it as
      // a recursive closure over the same predicate), but O(n²) compare
      // work. The production path a deployment runs — and the plan that
      // carries to 100 TB — is the same Components core over the
      // LSH-bucketed pair source (q45's path): candidates from signature
      // equi-joins, exact cosine verify, then clustering.
      //
      // APPROXIMATE: LSH recall < 1 by construction, so this benched plan
      // can cluster fewer docs than the oracle-certified all-pairs entry
      // above — the correctness gate does NOT cover this entry's output,
      // only the exact formulation's. What IS pinned: plan shape
      // (nested-loop-free, PlanSpec), benched-⊆-oracle refinement
      // (precision 1 — every benched edge is cosine-verified) and a
      // doc-level recall band, both in OperatorsSpec. probeDepth=2 probes
      // Hamming-≤2 buckets: ~0.85 pair recall at the 0.4 boundary vs
      // 0.53 at depth 1, still reading 11/16 of the bucket space only on
      // the broadcast-probe side.
      "q66_embedding_clusters" -> qd { spark =>
        import org.apache.spark.sql.functions._
        val pairs = operators.SimilarityOps.cosineNearDupPairs(
          spark.table("embeddings"), "vec_id", "embedding", threshold = 0.4,
          planes = 4, probeDepth = 2)
        operators.Components.connectedComponents(pairs)
          .select(col("doc"), col("cluster"))
          .orderBy("doc")
      })


  /** Bench entries whose measured time is dominated by HARNESS fixed cost
    * rather than operator execution — the r14 verdict's ask to stop these
    * drowning per-round operator comparisons:
    *  - MemoryStream micro-batch replays (per-trigger state-store setup,
    *    checkpoint dirs, multi-batch orchestration ~2-2.6 s each): the
    *    operator inside each is oracle-equivalent to its batch twin;
    *  - full index-build-then-probe lifecycles (fresh parquet index write
    *    per measurement): the probe a deployment repeats is the cheap
    *    partition-filtered scan, the build is once-per-snapshot.
    * Since r16 the bench's headline `value` IS the harness-excluded
    * operator sum (metric `total_operator`), with `value_total` carrying
    * the grand total and `value_harness` the difference — round-over-round
    * movement reads on the operator sum by default. */
  val harnessQueries: Set[String] = Set(
    "q70_streaming_bloom_dedup", "q74_sessionize", "q79_streaming_windowed",
    "q81_streaming_sketch_sink", "q98_streaming_drift", "q107_streaming_semdedup",
    "q75_ann_ivf_index", "q82_ann_ivf_quantized", "q102_ann_kmeans_ivf",
    "q114_ann_pq_rerank", "q118_streaming_curation")

  /** Chain oracles whose CTE graphs reference intermediate results more
    * than once: DuckDB's CTE inlining re-evaluates the WHOLE upstream
    * chain per reference, which compounds across the two-epoch / staged
    * pipelines (measured at sf0.01: q122 548 s -> 0.5 s, q112 45 -> 0.4,
    * q118 ~25 min -> 5 s from the hint alone). Rewriting each CTE head to
    * `AS MATERIALIZED` is a DuckDB evaluation hint — same rows, same
    * types, evaluate-once — and together with the r20 inverted-index
    * near-dup reformulation it is what lets the driver's correctness
    * gate finish (r19 verdict #1). */
  private val chainOracles: Set[String] = Set(
    "q35_jaccard_pairs", "q36_minhash_lsh_pairs", "q46_curation",
    "q60_dedup_clusters", "q97_incremental_neardup",
    "q112_curate_full", "q115_curate_incremental", "q118_streaming_curation",
    "q121_curate_multimodal", "q122_curate_quality",
    "q123_curate_incremental_quality", "q126_curate_decontaminated",
    "q127_curate_incremental_decontaminated", "q128_leakage_free_split",
    "q131_curate_multimodal_video", "q132_curate_trimodal",
    "q133_curate_incremental_media", "q136_quality_keep_clusters",
    "q139_incremental_split", "q141_split_profile",
    "q149_curate_from_html", "q150_curate_media_dup",
    "q155_curate_incremental_media_dup", "q157_curate_lang",
    "q158_curate_multimodal_dup", "q159_curate_incremental_multimodal_dup",
    "q160_curate_incremental_lang", "q161_curate_web_domains",
    "q163_curate_rules", "q164_curate_incremental_rules",
    "q166_curate_pii", "q167_curate_web_rules", "q168_curate_rep_rules")

  /** `name AS (` at line start -> `name AS MATERIALIZED (`; the leading
    * `WITH` / `WITH RECURSIVE` is preserved, and recursive members are
    * untouched automatically (their heads carry a column list, which the
    * pattern does not match). */
  private def materializeCtes(sql: String): String =
    sql.replaceAll("(?m)^(WITH (?:RECURSIVE )?)?(\\w+) AS \\(",
      "$1$2 AS MATERIALIZED (")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = oracleSqlPlain.map {
    case (k, v) if chainOracles(k) => k -> materializeCtes(v)
    case kv => kv
  }

  private def oracleSqlPlain: Map[String, String] = {
    val base = sketchOracle ++ textOracle ++ similarityOracle ++
      relationalOracle ++ streamingOracle ++ driftOracle ++ pipelineOracle
    // q136 composes two existing oracle bodies as derived tables: q60's
    // component closure (the same pair evidence) and q119's NB scores,
    // with the keep rule a per-cluster argmax (score DESC NULLS LAST,
    // then min id) — singletons are their own cluster via coalesce.
    base + ("q141_split_profile" ->
      s"""WITH sp AS (SELECT * FROM (${base("q128_leakage_free_split")})),
         |sd AS (SELECT sp.split, d.source,
         |              CAST(len(string_split_regex(trim(d.text), '\\s+')) AS DOUBLE) AS ntok
         |       FROM sp JOIN documents d USING (doc_id)),
         |agg AS (SELECT split, count(*) AS n_docs,
         |               count(DISTINCT source) AS n_sources
         |        FROM sd GROUP BY split),
         |r AS (SELECT split, ntok,
         |             cume_dist() OVER (PARTITION BY split ORDER BY ntok) AS cd
         |      FROM sd)
         |SELECT a.split, a.n_docs, a.n_sources,
         |       (SELECT min(ntok) FROM r WHERE r.split = a.split AND cd >= 0.5) AS p50_tokens,
         |       (SELECT min(ntok) FROM r WHERE r.split = a.split AND cd >= 0.9) AS p90_tokens
         |FROM agg a ORDER BY a.split""".stripMargin) +
    ("q140_training_order" ->
      s"""WITH ep AS (SELECT * FROM (${base("q135_epoch_mixture")})),
         |c AS (SELECT doc_id, n_tokens,
         |             unnest(generate_series(1, CAST(epochs AS BIGINT))) AS copy_idx
         |      FROM ep WHERE epochs >= 1),
         |k AS (SELECT doc_id, copy_idx, n_tokens,
         |             md5(CAST(doc_id AS VARCHAR) || ':' || CAST(copy_idx AS VARCHAR)) AS key
         |      FROM c),
         |w AS (SELECT doc_id, copy_idx, n_tokens,
         |             sum(n_tokens) OVER (ORDER BY key, doc_id, copy_idx) AS cum
         |      FROM k)
         |SELECT doc_id AS doc, CAST(copy_idx AS BIGINT) AS copy_idx,
         |       n_tokens AS ntok,
         |       CAST(floor((cum - n_tokens) / 1000) AS BIGINT) AS shard
         |FROM w ORDER BY doc, copy_idx""".stripMargin) +
    ("q137_curriculum_shards" ->
      s"""WITH sc AS (SELECT * FROM (${base("q83_trigram_lm")})),
         |t AS (SELECT d.doc_id, sc.lm_score_u,
         |             CAST(len(string_split_regex(trim(d.text), '\\s+')) AS BIGINT) AS ntok
         |      FROM documents d JOIN sc ON sc.doc_id = d.doc_id),
         |w AS (SELECT doc_id, lm_score_u, ntok,
         |             sum(ntok) OVER (ORDER BY lm_score_u, doc_id) AS cum
         |      FROM t)
         |SELECT doc_id AS doc, lm_score_u, ntok,
         |       CAST(floor((cum - ntok) / 2000) AS BIGINT) AS shard
         |FROM w ORDER BY doc""".stripMargin) +
    // q169 composes the q143 recursive-BPE replay and the q156 trained
    // lang-ID chains (CTE namespaces disjoint: bpe m/w/enc/tok/d/bagg/
    // bpen vs lang l-prefix), extracted from the two base texts with
    // anchor asserts so all three stay in lockstep.
    ("q169_tokenizer_qa" -> {
      val q143 = base("q143_bpe_encode")
      val q156 = base("q156_lang_classifier")
      val bpeHead = "WITH RECURSIVE "
      val bpeTail = "\nSELECT doc_id, n_bpe AS n_bpe_tokens,"
      val langHead = "WITH lnorm AS ("
      val langTail = "\nSELECT doc_id, CAST(n_tri AS BIGINT) AS n_tri, lang AS pred_lang,"
      require(q143.startsWith(bpeHead) && q143.contains(bpeTail) &&
        q156.startsWith(langHead) && q156.contains(langTail),
        "q143/q156 oracle anchors drifted - update the q169 derivation")
      val bpeCtes = q143.substring(bpeHead.length, q143.indexOf(bpeTail))
      val langCtes = q156.substring("WITH ".length, q156.indexOf(langTail))
      s"""WITH RECURSIVE $bpeCtes,
         |$langCtes,
         |qpick AS (SELECT doc_id, lang FROM lpick WHERE rn = 1),
         |qst AS (SELECT doc.doc_id, p.lang,
         |               CAST(len(string_split_regex(trim(doc.text), '\\s+')) AS BIGINT) AS nw,
         |               CAST(length(regexp_replace(trim(doc.text), '\\s+', '', 'g')) AS BIGINT) AS nc
         |        FROM documents doc JOIN qpick p USING (doc_id)),
         |qj AS (SELECT qst.*, b.n_bpe FROM qst JOIN bpen b USING (doc_id))
         |SELECT lang AS pred_lang, count(*) AS n_docs,
         |       CAST(sum(n_bpe) AS BIGINT) AS bpe_tokens,
         |       CAST(sum(nw) AS BIGINT) AS words,
         |       CAST(sum(nc) AS BIGINT) AS chars,
         |       CAST(floor(CAST(sum(nc) AS DOUBLE) / sum(n_bpe) * 1000000) AS BIGINT) AS chars_per_token_u,
         |       CAST(floor(CAST(sum(n_bpe) AS DOUBLE) / sum(nw) * 1000000) AS BIGINT) AS fertility_u
         |FROM qj GROUP BY lang ORDER BY pred_lang""".stripMargin
    }) +
    ("q136_quality_keep_clusters" ->
      s"""WITH comp AS (SELECT * FROM (${base("q60_dedup_clusters")})),
         |sc AS (SELECT * FROM (${base("q119_seed_classifier")})),
         |b AS (SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster,
         |             sc.nb_score_u AS s
         |      FROM documents d
         |      LEFT JOIN comp c ON d.doc_id = c.doc
         |      LEFT JOIN sc ON sc.doc_id = d.doc_id)
         |SELECT doc_id, cluster,
         |       (row_number() OVER (PARTITION BY cluster
         |          ORDER BY s DESC NULLS LAST, doc_id) = 1) AS kept
         |FROM b ORDER BY doc_id""".stripMargin)
  }
}
