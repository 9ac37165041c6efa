package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media assets are opaque `binary` columns with a typed metadata struct,
  * the standard lakehouse shape for 100 TB multimodal corpora: content
  * bytes stay in parquet binary pages (column-pruned away unless the query
  * touches them), metadata is queryable without decoding.
  *
  * The decode step is STUBBED — this container has no image/audio codecs —
  * with a deterministic fake that parses our synthetic 16-byte header. The
  * Spark-side plumbing (schema, partition-parallel `mapPartitions` decode,
  * batch shape, frame sampling) is real and tested; swap
  * [[decodeStubFeatures]]'s body for a JNI/codec call in production.
  */
object MediaOps {

  case class MediaMeta(format: String, width: Int, height: Int, duration_ms: Int)
  case class MediaRow(doc_id: Long, content: Array[Byte],
                      format: String, width: Int, height: Int, duration_ms: Int)
  case class MediaFeatures(doc_id: Long, feature_dim: Int, content_len: Int,
                           checksum: Long, features: Array[Float])

  private val formats = Seq("jpeg", "png", "webp")

  /** Fabricate a deterministic media table from the documents table:
    * content = 16-byte synthetic header ++ utf8(text); metadata derived
    * arithmetically from doc_id (so an ANSI oracle exists). */
  def mediaTable(documents: DataFrame): DataFrame = {
    val fmt = element_at(
      array(formats.map(lit): _*), (col("doc_id") % 3 + 1).cast("int"))
    documents.select(
      col("doc_id"),
      concat(
        encode(rpad(fmt, 8, " "), "UTF-8"),
        encode(lpad((col("doc_id") % 100000).cast("string"), 8, "0"), "UTF-8"),
        encode(col("text"), "UTF-8")).as("content"),
      struct(
        fmt.as("format"),
        (lit(320) + (col("doc_id") % 8) * 160).cast("int").as("width"),
        (lit(240) + (col("doc_id") % 8) * 120).cast("int").as("height"),
        (lit(1000) + (col("doc_id") % 60) * 500).cast("int").as("duration_ms")).as("meta"))
  }

  /** STUB decode: parse the synthetic header and emit deterministic fake
    * features. Real implementation would call an image/audio codec here;
    * the signature — binary in, fixed-dim float features out, executed
    * partition-parallel with no shuffle — is the production shape. */
  def decodeStubFeatures(media: DataFrame, dim: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val rows = media.select(
      col("doc_id"), col("content"),
      col("meta.format").as("format"), col("meta.width").as("width"),
      col("meta.height").as("height"), col("meta.duration_ms").as("duration_ms"))
      .as[MediaRow]
    rows.mapPartitions { it =>
      it.map { r =>
        // ---- STUB: deterministic fake "decode" ----
        // checksum = sum of content bytes; features = affine map of
        // (width, height, byte-sum) — stands in for codec output.
        var sum = 0L
        var i = 0
        while (i < r.content.length) { sum += (r.content(i) & 0xFF); i += 1 }
        val feats = Array.tabulate(dim)(d =>
          ((sum % 1000).toFloat / 1000f) + d * 0.25f + r.width.toFloat / 10000f)
        MediaFeatures(r.doc_id, dim, r.content.length, sum, feats)
      }
    }
  }

  /** Frame sampling: one row per sampled frame timestamp, every
    * `stepMs` ms over the duration — pure generator, no decode, so
    * Catalyst prunes `content` out of the scan entirely. */
  def frameSample(media: DataFrame, stepMs: Int): DataFrame =
    media.select(
      col("doc_id"), col("meta.format").as("format"),
      posexplode(sequence(lit(0), col("meta.duration_ms") - 1, lit(stepMs))))
      .withColumnsRenamed(Map("pos" -> "frame_idx", "col" -> "ts_ms"))

  /** Register `media` as a temp view derived from `documents`. */
  def registerViews(spark: SparkSession): Unit =
    mediaTable(spark.table("documents")).createOrReplaceTempView("media")
}
