package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (cross-batch) exact dedup — the ingest-time shape.
  *
  * A production corpus is not deduplicated once; every new crawl batch
  * must be checked against ALL history. Re-joining each batch against the
  * full historical fingerprint table shuffles the history every day. The
  * incremental pattern: keep a bloom filter over historical fingerprints
  * (KBs–MBs, mergeable, persisted next to the corpus — the
  * `datasketch_bloom` / `datasketch_bloom_union` aggregates), probe the
  * new batch against it AT THE SCAN (codegen'd `might_contain` literal,
  * same mechanics as [[BloomPrune]]), and exact-verify only the
  * candidates. Because bloom filters have no false negatives, the result
  * is EXACTLY the anti-join of the batch against history; false positives
  * only cost fpp·|batch| rows of residual verify traffic.
  *
  * At 100 TB: the history side of the verify join is pruned by the same
  * filter (a fingerprint the filter rejects can't be a candidate's
  * partner), so the daily cost is O(|batch| + matches), not O(|history|).
  */
object IncrementalDedup {

  /** The history-side filter blob: one aggregate job over history's
    * fingerprints. In production this is built once per corpus snapshot,
    * persisted in the metadata store, `datasketch_bloom_union`-merged as
    * batches are admitted, and READ BACK per batch — not recomputed.
    * Callers with that lifecycle pass it to [[dedupAgainstHistory]] via
    * `historyBlob`. Null when history is empty. */
  def buildHistoryFilter(history: DataFrame, textCol: String,
                         maxDistinct: Long = 1 << 20,
                         fpp: Double = 0.01): Array[Byte] =
    history.agg(
        call_function("datasketch_bloom", lit(maxDistinct), lit(fpp),
          TextOps.fingerprint(col(textCol))).as("f"))
      .head().getAs[Array[Byte]](0)

  /** Filter capacity for an expected key count, with the shared
    * [[graft.streaming.StreamingDedup.CapacityHeadroom]] policy (the
    * sharded streaming geometry and this single-blob shape must not
    * drift apart on sizing). Floored at 1024 — below that the filter is
    * a few hundred bytes and further shrinking buys nothing. */
  def sizedMaxDistinct(expectedKeys: Long): Long = {
    require(expectedKeys > 0, s"expectedKeys must be positive, got $expectedKeys")
    math.max(1024L,
      math.ceil(expectedKeys * graft.streaming.StreamingDedup.CapacityHeadroom).toLong)
  }

  /** [[dedupAgainstHistory]] with both filters sized from expected counts
    * instead of the unconditional 2^20 default. Filter bytes are a
    * per-aggregation-buffer cost (each partial-agg task heapifies,
    * merges, and serializes the full filter), so an oversized filter
    * taxes every batch: the r11 measurement put the default at ~6× the
    * right-sized build time on a 10k-key corpus. Exceeding the expected
    * counts doesn't break correctness — it degrades the history filter's
    * fpp, i.e. more residual verify traffic, never wrong output. */
  def dedupAgainstHistorySized(batch: DataFrame, history: DataFrame,
                               idCol: String, textCol: String,
                               expectedHistoryDocs: Long,
                               expectedBatchDocs: Long,
                               fpp: Double = 0.01,
                               historyBlob: Option[Array[Byte]] = None): DataFrame =
    dedupAgainstHistory(batch, history, idCol, textCol,
      sizedMaxDistinct(expectedHistoryDocs), fpp, historyBlob,
      candMaxDistinct = sizedMaxDistinct(expectedBatchDocs))

  /** Rows of `batch` whose text fingerprint does not occur in `history` —
    * the docs a pipeline would admit. Output schema = `batch` schema.
    * `maxDistinct`/`fpp` size the filters (see sketch.Bloom);
    * `historyBlob` supplies a prebuilt/persisted history filter (None →
    * build it here with one extra job); `candMaxDistinct` sizes the
    * candidate-set filter separately (candidates are bounded by the
    * batch, usually far smaller than history; -1 → reuse `maxDistinct`). */
  def dedupAgainstHistory(batch: DataFrame, history: DataFrame,
                          idCol: String, textCol: String,
                          maxDistinct: Long = 1 << 20,
                          fpp: Double = 0.01,
                          historyBlob: Option[Array[Byte]] = None,
                          candMaxDistinct: Long = -1L): DataFrame = {
    val fp = TextOps.fingerprint(col(textCol))
    val blob = historyBlob.getOrElse(
      buildHistoryFilter(history, textCol, maxDistinct, fpp))
    if (blob == null) return batch // empty history: everything is new
    val probe = call_function("datasketch_bloom_might_contain", lit(blob), fp)
    // candidates: true dups + ~fpp·|batch| false positives
    val cand = batch.filter(probe)
      .select(col(idCol).as("__inc_id"), fp.as("__inc_fp"))
    // Verify join. The history side is pruned with a SECOND bloom, built
    // over the (small) candidate set — pruning history with its own
    // filter would be a no-op (every history row passes). No false
    // negatives on the candidate filter means no real partner is
    // dropped, so the result is still exact; both join inputs now carry
    // (id, 16 B fingerprint) rows bounded by candidates + fpp·|history|.
    // (In production the history scan reads a persisted narrow
    // fingerprint table, not the raw text.)
    val candCap = if (candMaxDistinct > 0) candMaxDistinct else maxDistinct
    val candBlob = cand.agg(
        call_function("datasketch_bloom", lit(candCap), lit(fpp),
          col("__inc_fp")).as("f"))
      .head().getAs[Array[Byte]](0)
    if (candBlob == null) return batch // no candidates: everything is new
    val histFp = history
      .filter(call_function("datasketch_bloom_might_contain", lit(candBlob), fp))
      .select(fp.as("__hist_fp")).distinct()
    val confirmed = cand.join(histFp, col("__inc_fp") === col("__hist_fp"), "left_semi")
      .select(col("__inc_id"))
    batch.join(confirmed, batch(idCol) === col("__inc_id"), "left_anti")
  }
}
