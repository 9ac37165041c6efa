package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-repo Matroska (MKV) demuxer — the third real-container leg of the
  * video modality, completing the AVI → MP4 → MKV triple behind
  * [[VideoOps.VideoContainer]]: parses the actual EBML document
  * structure (`EBML` header, `Segment(Info Tracks(TrackEntry…)
  * Cluster(Timestamp SimpleBlock…)…)`) that `ffmpeg -c:v mjpeg out.mkv`
  * emits, so a user with real `.mkv`/`.webm`-layout files runs the
  * SAME downstream plan ([[VideoOps.decodeFrames]]) with
  * `container = MkvContainer` and nothing else changes.
  *
  * Parser shape: one recursive descent over EBML elements — IDs are
  * read with their marker bit (class-A..D lengths), sizes are
  * marker-stripped varints with the all-ones "unknown size" convention
  * mapped to to-end-of-parent (live-streamed Segments/Clusters use it).
  * The FIRST `TrackEntry` whose `TrackType` is 1 (video) selects the
  * track number; frame payloads come from `SimpleBlock` (and
  * `BlockGroup`→`Block`) elements carrying that track number, in
  * storage order. fps = round(1e9 / `DefaultDuration`) when the track
  * header carries it (the normal MJPEG case), else derived from the
  * first two block timestamps, else 1. Lacing (rare for video) is not
  * expanded: a laced block contributes only its first frame — frame
  * COUNT stays conservative rather than wrong. Corrupt/truncated
  * containers → None (dropped, not fatal) — the
  * [[VideoOps.VideoContainer]] contract.
  *
  * Block payloads are handed to the pluggable image codec untouched
  * (`V_MJPEG` = one JPEG per block; the codec sniffs the bytes, the
  * demuxer never inspects them), so the deterministic fixture stores
  * lossless PNG payloads in the same container and closed-form pixel
  * checksums stay oracle-expressible.
  */
object MkvContainer extends VideoOps.VideoContainer {

  // ------------------------------------------------------------- EBML ids
  private val IdEbml = 0x1A45DFA3L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdTrackNumber = 0xD7L
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdDefaultDuration = 0x23E383L
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL
  private val IdCluster = 0x1F43B675L
  private val IdTimestamp = 0xE7L
  private val IdSimpleBlock = 0xA3L
  private val IdBlockGroup = 0xA0L
  private val IdBlock = 0xA1L
  private val IdTimestampScale = 0x2AD7B1L

  // -------------------------------------------------------------- writers

  /** Raw element-ID bytes (IDs are stored WITH their marker bit). */
  private def idBytes(id: Long): Array[Byte] = {
    val len = if (id <= 0xFF) 1 else if (id <= 0xFFFF) 2
              else if (id <= 0xFFFFFF) 3 else 4
    (0 until len).map(i => ((id >> (8 * (len - 1 - i))) & 0xFF).toByte).toArray
  }

  /** Minimal-length EBML size varint (marker-stripped value). */
  private def vint(v: Long): Array[Byte] = {
    var len = 1
    // a length-n varint holds 7n value bits, minus the all-ones reserved code
    while (len < 8 && v >= (1L << (7 * len)) - 1) len += 1
    val out = new Array[Byte](len)
    var x = v | (1L << (7 * len)) // set the marker bit
    var i = len - 1
    while (i >= 0) { out(i) = (x & 0xFF).toByte; x >>= 8; i -= 1 }
    out
  }

  private def uintBytes(v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && (v >>> (8 * len)) != 0) len += 1
    (0 until len).map(i => ((v >>> (8 * (len - 1 - i))) & 0xFF).toByte).toArray
  }

  private def el(id: Long, body: Array[Byte]*): Array[Byte] = {
    val b = body.flatten.toArray
    idBytes(id) ++ vint(b.length.toLong) ++ b
  }
  private def elUint(id: Long, v: Long): Array[Byte] = el(id, uintBytes(v))
  private def elStr(id: Long, s: String): Array[Byte] = el(id, s.getBytes("US-ASCII"))

  /** Minimal spec-correct MKV writer (the test/ingest half of the
    * round-trip): EBML header (DocType `matroska`), one Segment with
    * Info (TimestampScale), one `V_MJPEG` video TrackEntry
    * (DefaultDuration = 1e9/fps unless suppressed), and one Cluster per
    * frame — cluster Timestamp = floor(idx·1e9/fps/scale) TICKS, each
    * frame a keyframe SimpleBlock with relative timestamp 0 and no
    * lacing (the layout real muxers produce, at one-frame cluster
    * granularity). `timestampScaleNs`/`withDefaultDuration` exist to
    * fixture the fps-from-scaled-tick-deltas fallback path. */
  def mux(fps: Int, frames: Seq[Array[Byte]], width: Int = 32, height: Int = 24,
          timestampScaleNs: Long = 1000000L,
          withDefaultDuration: Boolean = true): Array[Byte] = {
    require(fps > 0, s"fps must be positive, got $fps")
    require(timestampScaleNs > 0, s"timestampScaleNs must be positive, got $timestampScaleNs")
    val header = el(IdEbml,
      elUint(0x4286L, 1), elUint(0x42F7L, 1), elUint(0x42F2L, 4), elUint(0x42F3L, 8),
      elStr(0x4282L, "matroska"), elUint(0x4287L, 2), elUint(0x4285L, 2))
    val info = el(IdInfo, elUint(IdTimestampScale, timestampScaleNs))
    val trackEntry = el(IdTrackEntry,
      (Seq(
        elUint(IdTrackNumber, 1), elUint(0x73C5L /* TrackUID */ , 1),
        elUint(IdTrackType, 1), elStr(IdCodecId, "V_MJPEG")) ++
       (if (withDefaultDuration) Seq(elUint(IdDefaultDuration, 1000000000L / fps)) else Nil) ++
       Seq(el(IdVideo, elUint(IdPixelWidth, width.toLong), elUint(IdPixelHeight, height.toLong)))): _*)
    val tracks = el(IdTracks, trackEntry)
    val clusters = frames.zipWithIndex.map { case (f, idx) =>
      // SimpleBlock: track varint, i16 relative timestamp, flags (0x80 =
      // keyframe, no lacing), then the payload. Cluster Timestamp is in
      // TICKS of the Info TimestampScale, not milliseconds.
      val blockBody = vint(1L) ++ Array[Byte](0, 0, 0x80.toByte) ++ f
      el(IdCluster,
        elUint(IdTimestamp, idx.toLong * 1000000000L / fps / timestampScaleNs),
        el(IdSimpleBlock, blockBody))
    }
    val segment = el(IdSegment, (Seq(info, tracks) ++ clusters): _*)
    header ++ segment
  }

  // -------------------------------------------------------------- demux

  override def demux(bytes: Array[Byte]): Option[VideoOps.VideoStream] =
    try {
      if (bytes.length < 8) return None
      val bb = java.nio.ByteBuffer.wrap(bytes)

      /** EBML element ID: length from leading zeros, marker KEPT. */
      def readId(): Long = {
        val first = bb.get() & 0xFF
        val len = Integer.numberOfLeadingZeros(first) - 23 // 1..4 for valid IDs
        if (len < 1 || len > 4) throw new RuntimeException("bad EBML id")
        var v = first.toLong
        for (_ <- 1 until len) v = (v << 8) | (bb.get() & 0xFF)
        v
      }

      /** EBML size varint: marker STRIPPED; -1 = unknown size. */
      def readSize(): Long = {
        val first = bb.get() & 0xFF
        val len = Integer.numberOfLeadingZeros(first) - 23
        if (len < 1 || len > 8) throw new RuntimeException("bad EBML size")
        var v = (first & (0xFF >>> len)).toLong
        for (_ <- 1 until len) v = (v << 8) | (bb.get() & 0xFF)
        if (v == (1L << (7 * len)) - 1) -1L else v // all value bits set
      }

      def readUint(len: Int): Long = {
        var v = 0L
        for (_ <- 0 until math.min(len, 8)) v = (v << 8) | (bb.get() & 0xFF)
        v
      }

      // state assembled during the walk
      var videoTrack = -1L
      var defaultDurationNs = 0L
      // Info TimestampScale: ns per timestamp tick (Matroska default
      // 1,000,000 = 1 ms). Block/cluster timestamps are in TICKS — a
      // file with a non-default scale and no DefaultDuration would
      // otherwise derive fps from tick deltas misread as milliseconds.
      var timestampScaleNs = 1000000L
      var firstTs = -1L
      var secondTs = -1L
      var clusterTs = 0L
      var trackNum = -1L
      var trackType = -1L
      var trackDd = 0L
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

      def readBlock(end: Long): Unit = {
        // Block/SimpleBlock: track varint, i16 relative ts, flags, payload
        val track = readSize()
        val rel = bb.getShort.toLong
        val flags = bb.get() & 0xFF
        if (track == videoTrack && bb.position() <= end) {
          if ((flags & 0x06) == 0) { // no lacing: the whole rest is one frame
            val len = (end - bb.position()).toInt
            if (len >= 0) {
              val f = new Array[Byte](len)
              bb.get(f)
              frames += f
            }
          } else {
            // laced blocks (rare for video): conservative first-frame-only
            // would need lace-size parsing per scheme; skip the block
          }
          val abs = clusterTs + rel
          if (firstTs < 0) firstTs = abs
          else if (secondTs < 0 && abs != firstTs) secondTs = abs
        }
      }

      def walk(end: Long, depth: Int): Unit =
        while (bb.position() + 2 <= end) {
          val id = readId()
          val sz = readSize()
          val size = if (sz < 0) end - bb.position() else sz // unknown → parent end
          val next = bb.position() + size
          if (next > end || size < 0) return // truncated: keep what demuxed
          id match {
            case IdSegment | IdInfo | IdTracks | IdCluster if depth < 8 =>
              if (id == IdCluster) clusterTs = 0L
              walk(next, depth + 1)
            case IdTrackEntry if depth < 8 =>
              trackNum = -1L; trackType = -1L; trackDd = 0L
              walk(next, depth + 1)
              if (videoTrack < 0 && trackType == 1L && trackNum > 0) {
                videoTrack = trackNum
                defaultDurationNs = trackDd
              }
            case IdBlockGroup if depth < 8 => walk(next, depth + 1)
            case IdTrackNumber => trackNum = readUint(size.toInt)
            case IdTrackType => trackType = readUint(size.toInt)
            case IdDefaultDuration => trackDd = readUint(size.toInt)
            case IdTimestampScale =>
              val s = readUint(size.toInt)
              if (s > 0) timestampScaleNs = s
            case IdTimestamp => clusterTs = readUint(size.toInt)
            case IdSimpleBlock | IdBlock if videoTrack > 0 => readBlock(next)
            case _ => () // EBML header, CodecID, Video, Cues, SeekHead, …
          }
          bb.position(next.toInt)
        }

      // the document must LEAD with the EBML header element
      val firstId = readId()
      if (firstId != IdEbml) return None
      val hdrSize = readSize()
      if (hdrSize < 0 || bb.position() + hdrSize > bytes.length) return None
      bb.position((bb.position() + hdrSize).toInt)
      // a corrupt TAIL must not discard frames already demuxed — swallow
      // mid-walk parse failures and evaluate whatever state accumulated
      try walk(bytes.length.toLong, 0)
      catch { case scala.util.control.NonFatal(_) => () }

      if (videoTrack < 0 || frames.length > (1 << 20)) return None
      val fps =
        if (defaultDurationNs > 0)
          math.max(1, math.round(1e9 / defaultDurationNs)).toInt
        else if (secondTs > firstTs && firstTs >= 0)
          // tick delta → ns via the captured TimestampScale, then to fps
          math.max(1, math.round(1e9 /
            ((secondTs - firstTs).toDouble * timestampScaleNs))).toInt
        else 1
      Some(VideoOps.VideoStream(fps, frames.toIndexedSeq))
    } catch { case scala.util.control.NonFatal(_) => None }

  // ----------------------------------------------------------- fixtures

  /** Deterministic test MKV for `docId`: 2 + id%3 frames at 5 fps,
    * frame f = [[MediaOps.testPngBytes]] of the derived id 17·docId + f
    * — lossless payloads, so per-frame dimensions and checksums keep
    * the q42 closed forms at `fid = 17·doc_id + frame_idx` through a
    * REAL EBML demux; ts_ms = frame_idx · 200 exactly. */
  def testMkvBytes(docId: Long): Array[Byte] = {
    val n = 2 + (docId % 3).toInt
    mux(5, (0 until n).map(f => MediaOps.testPngBytes(17 * docId + f)))
  }

  /** (doc_id, content) table of [[testMkvBytes]] containers, encoded
    * partition-parallel — the ingest half of the round-trip. */
  def mkvTable(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => (id, testMkvBytes(id))))
      .toDF("doc_id", "content")
  }

  /** Real-MJPEG fixture: a JPEG-encoded gradient per block under
    * `V_MJPEG` — the genuine Matroska motion-JPEG layout. Dimensions
    * stay exact; pixel values are codec-dependent, so specs compare
    * against an in-JVM reference decode, not a closed form. */
  def testMjpegMkvBytes(docId: Long): Array[Byte] = {
    val n = 2 + (docId % 3).toInt
    val frames = (0 until n).map { f =>
      val png = MediaOps.testPngBytes(17 * docId + f)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    mux(5, frames)
  }
}
