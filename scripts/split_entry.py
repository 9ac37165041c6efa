#!/usr/bin/env python3
"""One-shot mechanical split of SparkEntry.scala by domain (r15 verdict #8).

Moves shared helpers into trait EntryInfra; partitions the `queries` and
`oracleSql` map literals into five domain traits; SparkEntry becomes the
facade object combining them. Zero intended behavior change.
"""
import re, sys

SRC = "/root/repo/src/main/scala/graft/SparkEntry.scala"
lines = open(SRC).read().split("\n")

def find(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit(f"marker not found from {start}")

obj_open   = find(lambda l: l.startswith("object SparkEntry {"))
entry_doc  = find(lambda l: "/** Flagship query" in l)
queries_def = find(lambda l: l.startswith("  def queries:"))
bench_doc  = find(lambda l: "/** What the benchmark times:" in l)
oracle_def = find(lambda l: l.startswith("  def oracleSql:"))

header = lines[:obj_open]                 # file scaladoc + package + import
infra  = lines[obj_open+1:entry_doc]      # helpers
entryb = lines[entry_doc:queries_def-1]   # entry() + trailing blank handling
# scaladoc line(s) for queries sit between entry block and def queries
qdoc_start = queries_def
while lines[qdoc_start-1].strip().startswith(("/**", "*", "*/")) or lines[qdoc_start-1].strip() == "":
    qdoc_start -= 1
entryb = lines[entry_doc:qdoc_start]
queries_doc = lines[qdoc_start:queries_def]

bench_sec = lines[bench_doc:oracle_def]   # includes oracle scaladoc? check below
# oracle scaladoc lives just above def oracleSql
odoc_start = oracle_def
while lines[odoc_start-1].strip().startswith(("/**", "*", "*/")) or lines[odoc_start-1].strip() == "":
    odoc_start -= 1
bench_sec = lines[bench_doc:odoc_start]
oracle_doc = lines[odoc_start:oracle_def]

ENTRY_RE = re.compile(r'^\s{4,5}"(q\d+[a-z0-9_]*)" ->')

def split_map(body_lines):
    """body_lines: lines after `= Map(` line up to and including closing `  )`.
    Returns ordered list of (key, block_lines)."""
    starts = [i for i, l in enumerate(body_lines) if ENTRY_RE.match(l)]
    assert starts, "no entries found"
    # closing ')' line index: last line that is exactly '  )'
    close = max(i for i, l in enumerate(body_lines) if l.rstrip() == "  )")
    blocks = []
    bounds = starts + [close]
    # move leading comments/blank lines attached to each entry
    adj = []
    for s in starts:
        t = s
        while t > 0 and (body_lines[t-1].strip().startswith("//") or body_lines[t-1].strip() == ""):
            t -= 1
        adj.append(t)
    # re-split: block i = adj[i] .. adj[i+1]-1 (for last: .. close-1)
    out = []
    for i, s in enumerate(starts):
        key = ENTRY_RE.match(body_lines[s]).group(1)
        b0 = adj[i]
        b1 = adj[i+1] if i+1 < len(starts) else close
        blk = body_lines[b0:b1]
        # strip leading blank lines
        while blk and blk[0].strip() == "":
            blk.pop(0)
        while blk and blk[-1].strip() == "":
            blk.pop()
        out.append((key, blk))
    return out

qbody = lines[queries_def+1:bench_doc]
obody = lines[oracle_def+1:]
q_entries = split_map(qbody)
o_entries = split_map(obody)

SKETCH = {"q01_pricing_summary","q02_hll_distinct","q03_hll_union_two_level","q04_hll_meta",
"q05_cpc_distinct","q06_cpc_union_two_level","q07_theta_distinct","q08_theta_setops",
"q09_theta_grouped","q10_theta_jaccard","q11_kll_quantiles","q12_kll_rank_cdf","q13_kll_merge",
"q14_kll_long_elem","q15_quantiles_classic","q16_req_quantile","q17_tdigest","q18_freq_items",
"q19_freq_merge","q20_freq_numeric_keys","q21_events_hourly_users","q22_sketch_meta",
"q23_highcard_groups","q50_reservoir_sample","q51_varopt_sample","q53_aod_overlap",
"q54_empty_semantics","q55_windowed_theta","q56_quantiles_float","q57_error_taxonomy",
"q68_describe_probes","q69_rollup_sketches","q71_kll_int_elem","q76_req_int_elem",
"q77_unsigned_widened","q78_alias_cast_sql","q99_overlap_matrix"}
TEXT = {"q30_token_stats","q31_quality_scores","q32_langid_counts","q33_fingerprints",
"q34_dedup_exact","q35_jaccard_pairs","q36_minhash_lsh_pairs","q37_simhash_pairs","q46_curation",
"q58_token_shards","q59_decontaminate","q60_dedup_clusters","q61_quota_sample","q62_pii_scan",
"q63_repetition","q64_incremental_dedup","q65_shared_grams","q67_boilerplate_ngrams",
"q83_trigram_lm","q84_paragraph_dedup","q85_duplicated_spans","q86_span_removal",
"q87_dsir_weights","q88_contamination_spans","q89_bm25","q90_tfidf_terms","q92_token_entropy",
"q97_incremental_neardup","q104_token_quota","q110_weighted_jaccard"}
SIM = {"q38_cosine_topk","q39_ann_lsh_topk","q44_cosine_neardup","q45_cosine_neardup_lsh",
"q66_embedding_clusters","q75_ann_ivf_index","q80_quantize_int8","q82_ann_ivf_quantized",
"q100_kmeans","q101_semdedup","q102_ann_kmeans_ivf","q103_incremental_semdedup",
"q105_semdedup_priority","q106_kmeans_sampled"}
REL = {"q40_media_meta","q41_frame_sample","q42_media_decode","q43_profiler","q47_asof_join",
"q48_bloom_prune","q49_range_bounds","q52_join_stats","q72_media_resize","q73_audio_decode",
"q108_topk_per_group","q109_interval_join","q111_zorder_key"}
STREAM = {"q70_streaming_bloom_dedup","q74_sessionize","q79_streaming_windowed",
"q81_streaming_sketch_sink","q98_streaming_drift","q107_streaming_semdedup"}
DRIFT = {"q91_kll_drift","q93_psi_drift","q94_drift_series","q95_rank_normalize","q96_profile_drift"}

domains = [
    ("SketchEntries", "sketch", SKETCH,
     "Apache DataSketches SQL-parity queries: the reference extension's 8 sketch\n  * families (hll/cpc/theta/kll/quantiles/req/tdigest/frequent-items), alias-type\n  * casts, sampling sketches, empty/error semantics, and stored-blob set algebra."),
    ("TextEntries", "text", TEXT,
     "Text-pipeline queries: tokenization/quality/langid/PII/repetition stats,\n  * exact + fuzzy (shingle/minhash/simhash/weighted-Jaccard) dedup, span dedup,\n  * decontamination, quotas/sharding, BM25/TF-IDF/entropy, trigram-LM + DSIR."),
    ("SimilarityEntries", "similarity", SIM,
     "Embedding similarity queries: brute-force + LSH/IVF/quantized ANN, cosine\n  * near-dup pairs and clusters, k-means, semantic dedup (batch/priority/\n  * incremental/sampled)."),
    ("RelationalEntries", "relational", REL,
     "Relational/pipeline operator queries: media decode/resize/frame-sample,\n  * as-of join, bloom prune, range bounds, join stats, profiler, top-k per\n  * group, interval join, z-order layout."),
    ("StreamingEntries", "streaming", STREAM,
     "Structured Streaming queries: bloom dedup, sessionization, windowed sketch\n  * aggregation, sketch-table sinks, streaming drift and semantic dedup —\n  * each a MemoryStream replay oracle-equivalent to its batch twin."),
    ("DriftEntries", "drift", DRIFT,
     "Distribution-drift queries: KS/PSI over stored sketch blobs, drift series,\n  * rank normalization, corpus profile drift."),
]

allkeys = set(k for k, _ in q_entries)
union = set()
for _, _, s, _ in domains:
    assert not (union & s), f"dup keys {union & s}"
    union |= s
missing = allkeys - union
extra = union - allkeys
assert not missing, f"unassigned: {sorted(missing)}"
assert not extra, f"assigned-but-absent: {sorted(extra)}"
okeys = set(k for k, _ in o_entries)
assert okeys <= allkeys, f"oracle-only keys: {sorted(okeys - allkeys)}"
print(f"{len(allkeys)} query entries, {len(okeys)} oracle entries")

# ---- write EntryInfra ----
infra_out = []
for l in infra:
    infra_out.append(re.sub(r"^(\s*)private (lazy val|val|def|type|var)", r"\1protected \2", l))
with open("/root/repo/src/main/scala/graft/EntryInfra.scala", "w") as f:
    f.write("""package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared infrastructure for the [[SparkEntry]] query catalog: session prep
  * (function registration + per-SF temp views + narrow-source widening),
  * corpus-snapshot memos (hot shingles, history bloom, pair evidence), and
  * the q/qd/qdd entry constructors. Split out of SparkEntry in r15 so the
  * catalog itself can live in per-domain traits (Sketch/Text/Similarity/
  * Relational/Streaming/Drift) without duplicating this plumbing; behavior
  * is identical — SparkEntry remains the only instance. */
private[graft] trait EntryInfra {
""")
    f.write("\n".join(infra_out).rstrip() + "\n}\n")

# ---- write domain traits ----
def emit(fn_name, blocks):
    s = []
    for i, (k, blk) in enumerate(blocks):
        s.append("\n".join(blk))
    return "\n\n".join(s)

for trait, prefix, keys, doc in domains:
    qb = [(k, b) for k, b in q_entries if k in keys]
    ob = [(k, b) for k, b in o_entries if k in keys]
    with open(f"/root/repo/src/main/scala/graft/entries/{trait}.scala", "w") as f:
        f.write(f"""package graft

import org.apache.spark.sql.{{DataFrame, SparkSession}}

/** {doc}
  *
  * Split from SparkEntry (r15): entries and oracle SQL verbatim, combined
  * by [[SparkEntry.queries]] / [[SparkEntry.oracleSql]]. */
private[graft] trait {trait} extends EntryInfra {{

  protected def {prefix}Queries: Map[String, (SparkSession, String) => DataFrame] = Map(
{emit(prefix, qb)}
  )

  protected def {prefix}Oracle: Map[String, String] = Map(
{emit(prefix, ob)}
  )
}}
""")

# ---- rewrite SparkEntry ----
with open(SRC, "w") as f:
    f.write("\n".join(header).rstrip("\n") + "\n")
    f.write("""object SparkEntry
  extends SketchEntries with TextEntries with SimilarityEntries
    with RelationalEntries with StreamingEntries with DriftEntries {

""")
    f.write("\n".join(entryb).rstrip() + "\n\n")
    f.write("\n".join(queries_doc).rstrip() + "\n")
    f.write("""  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sketchQueries ++ textQueries ++ similarityQueries ++ relationalQueries ++
      streamingQueries ++ driftQueries

""")
    f.write("\n".join(bench_sec).rstrip() + "\n\n")
    f.write("\n".join(oracle_doc).rstrip() + "\n")
    f.write("""  def oracleSql: Map[String, String] =
    sketchOracle ++ textOracle ++ similarityOracle ++ relationalOracle ++
      streamingOracle ++ driftOracle
}
""")
print("done")
