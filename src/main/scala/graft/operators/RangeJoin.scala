package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join as a bucketed EQUI-join.
  *
  * `SELECT * FROM points p JOIN intervals i ON p.t BETWEEN i.lo AND i.hi`
  * has no equi-key, so open-source Spark plans it as a broadcast
  * nested-loop join — O(|points| × |intervals|) comparisons, the classic
  * scale killer (commercial engines special-case it; OSS Catalyst does
  * not). This operator restores an equi-key by quantizing the domain into
  * fixed-width buckets:
  *
  *  - each interval is exploded to the buckets it covers
  *    (`(hi DIV w) - (lo DIV w) + 1` rows);
  *  - each point maps to its single bucket (`t DIV w`);
  *  - a plain shuffled/broadcast equi-join on the bucket id meets every
  *    (point, interval) pair whose bucket matches — a superset of the
  *    true matches — and the exact `BETWEEN` post-filter keeps the truth.
  *
  * No duplicates: a point lives in exactly ONE bucket, and an interval
  * covers that bucket at most once, so each true pair is met exactly once
  * — no distinct pass needed.
  *
  * Scale shape: the comparison work drops from |P|×|I| to
  * Σ_buckets |P_b|×|I_b|. The width `w` is the dial — pick w ≈ the p95
  * interval span so the expansion factor stays ~1–2× while bucket
  * co-occupancy stays low. The join is a plain equi-join: AQE can split
  * skewed buckets, broadcast a small exploded side, and the post-filter
  * is codegen'd. A pathological interval (span ≫ w) would explode to
  * span/w rows; [[RangeJoin.pointInInterval]] fails fast past
  * `maxBucketsPerInterval` with a readable error instead of silently
  * materializing millions of bucket rows.
  *
  * Domain: bucket ids come from truncating division, which agrees with
  * floor only for non-negative keys — callers with signed domains shift
  * them non-negative first (epoch micros already are).
  */
object RangeJoin {

  /** Inner-join `points` to every interval of `intervals` containing the
    * point. Output columns: all of `points` then all of `intervals`
    * (caller disambiguates name collisions beforehand).
    *
    * @param pointCol  LONG point column on `points` (non-negative domain)
    * @param loCol,hiCol  LONG inclusive bounds on `intervals`; rows with
    *                  `hi < lo` (empty intervals) match nothing
    * @param bucketWidth  the quantization width `w` in point units
    * @param maxBucketsPerInterval  fail-fast cap on per-interval expansion
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long,
                      maxBucketsPerInterval: Long = 10000L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    // `DIV` (integral division), NOT `floor(x / w)`: double division of
    // epoch-micro longs rounds — a point one unit under a bucket boundary
    // can land a half-ulp ABOVE it and silently miss its interval.
    def bdiv(c: String): Column =
      expr(s"CAST(`$c` AS BIGINT) DIV $bucketWidth")
    val nb = bdiv(hiCol) - bdiv(loCol) + lit(1L)
    val ib = intervals
      .filter(col(hiCol) >= col(loCol))
      .withColumn("__graft_bucket", explode(sequence(
        when(nb <= maxBucketsPerInterval, bdiv(loCol))
          .otherwise(raise_error(concat(
            lit(s"graft range join: interval spans more than " +
              s"$maxBucketsPerInterval buckets of width $bucketWidth ([")
            , col(loCol), lit(", "), col(hiCol),
            lit("]) — raise bucketWidth or maxBucketsPerInterval")))),
        bdiv(hiCol))))
    val pb = points.withColumn("__graft_bucket", bdiv(pointCol))
    pb.join(ib, "__graft_bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__graft_bucket")
  }
}
