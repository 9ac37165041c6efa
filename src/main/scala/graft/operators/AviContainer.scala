package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-repo RIFF/AVI demuxer — the real-container leg of the video
  * modality (r15 verdict #2): where [[VideoOps.GvidContainer]] is a
  * synthetic fixture format, this parses the actual AVI 1.0 layout
  * (`RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
  * 00dc…) idx1)`) that MJPEG cameras and ffmpeg `-c:v mjpeg` emit, so a
  * user with real `.avi` files runs the SAME downstream plan
  * ([[VideoOps.decodeFrames]]) with `container = AviContainer` and
  * nothing else changes.
  *
  * Parser shape: a single forward walk over the chunk tree — fps from
  * the `vids` stream header's rate/scale (falling back to the main
  * header's µs-per-frame), frame payloads from `..dc`/`..db` chunks of
  * stream 0 inside `movi` (including `rec ` groupings), all
  * little-endian, even-byte chunk padding respected, `idx1` ignored
  * (it's an optimization for seeking players, not needed for a linear
  * demux). Corrupt/truncated containers → None (dropped, not fatal) —
  * the [[VideoOps.VideoContainer]] contract.
  *
  * Frame payloads are handed to the pluggable image codec untouched:
  * real MJPEG (JPEG-per-frame) decodes through `javax.imageio`'s JPEG
  * reader, and the deterministic-fixture path stores lossless PNG
  * payloads in the same container so closed-form pixel checksums stay
  * oracle-expressible (PNG-in-AVI is container-legal — the handler
  * fourcc describes the payload, and this demuxer never inspects it).
  */
object AviContainer extends VideoOps.VideoContainer {

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Minimal spec-correct AVI writer (the test/ingest half of the
    * round-trip): one `vids` stream, handler `MJPG`, every frame a
    * `00dc` keyframe chunk with an `idx1` index — the layout `ffprobe`
    * accepts. `width`/`height` describe the nominal raster in the
    * headers; the per-frame payloads are self-describing images, so a
    * mixed-dimension fixture stays decodable. */
  def mux(fps: Int, frames: Seq[Array[Byte]], width: Int = 32, height: Int = 24): Array[Byte] = {
    require(fps > 0, s"fps must be positive, got $fps")
    val bos = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt((v & 0xFFFFFFFFL).toInt).array()
    }
    def u16(v: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(2).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putShort(v.toShort).array()
    }
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    // avih: 56-byte MainAVIHeader
    val avih = fourcc("avih") ++ u32(56) ++
      u32(1000000L / fps) ++ u32(0) ++ u32(0) ++ u32(0x10 /* HASINDEX */) ++
      u32(frames.length) ++ u32(0) ++ u32(1) ++ u32(maxFrame) ++
      u32(width) ++ u32(height) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(0)
    // strh: 56-byte AVIStreamHeader (vids/MJPG, fps = rate/scale)
    val strh = fourcc("strh") ++ u32(56) ++
      fourcc("vids") ++ fourcc("MJPG") ++ u32(0) ++ u16(0) ++ u16(0) ++ u32(0) ++
      u32(1) ++ u32(fps) ++ u32(0) ++ u32(frames.length) ++
      u32(maxFrame) ++ u32(0xFFFFFFFFL) ++ u32(0) ++
      u16(0) ++ u16(0) ++ u16(width) ++ u16(height)
    // strf: 40-byte BITMAPINFOHEADER, biCompression = 'MJPG'
    val strf = fourcc("strf") ++ u32(40) ++
      u32(40) ++ u32(width) ++ u32(height) ++ u16(1) ++ u16(24) ++
      fourcc("MJPG") ++ u32(width.toLong * height * 3) ++
      u32(0) ++ u32(0) ++ u32(0) ++ u32(0)
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      fourcc("LIST") ++ u32(body.length + 4L) ++ fourcc(typ) ++ body
    val strl = list("strl", strh ++ strf)
    val hdrl = list("hdrl", avih ++ strl)
    // movi body + idx1 (offsets relative to the 'movi' type fourcc)
    val moviBody = new java.io.ByteArrayOutputStream()
    val idx = new java.io.ByteArrayOutputStream()
    var off = 4L // first chunk sits right after the 'movi' fourcc
    frames.foreach { f =>
      moviBody.write(fourcc("00dc")); moviBody.write(u32(f.length))
      moviBody.write(f)
      if (f.length % 2 == 1) moviBody.write(0) // even-byte padding
      idx.write(fourcc("00dc")); idx.write(u32(0x10 /* KEYFRAME */))
      idx.write(u32(off)); idx.write(u32(f.length))
      off += 8L + f.length + (f.length % 2)
    }
    val movi = list("movi", moviBody.toByteArray)
    val idx1 = fourcc("idx1") ++ u32(idx.size().toLong) ++ idx.toByteArray
    val riffBody = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    bos.write(fourcc("RIFF")); bos.write(u32(riffBody.length.toLong))
    bos.write(riffBody)
    bos.toByteArray
  }

  override def demux(bytes: Array[Byte]): Option[VideoOps.VideoStream] =
    try {
      if (bytes.length < 12) return None
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def cc(): String = {
        val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
      }
      if (cc() != "RIFF") return None
      val riffSize = bb.getInt & 0xFFFFFFFFL
      if (riffSize < 4 || riffSize > bytes.length - 8L) return None
      if (cc() != "AVI ") return None

      var fps = 0
      // the VIDEO stream's index: AVI stream numbers are assigned by strl
      // order in hdrl, so count strh chunks and remember which one is
      // 'vids' — a camera file with audio as stream 0 keeps its frames in
      // '01dc' chunks, and hard-coding stream 0 would silently demux an
      // empty video (r16 review finding). hdrl precedes movi in the RIFF
      // layout, so the index is known before any frame chunk is seen;
      // headerless files fall back to stream 0.
      var streamIdx = 0
      var vidsIdx = -1
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

      // one forward walk; `end` bounds each (sub)list so a lying size
      // field can't read past its parent
      def walk(end: Long, inMovi: Boolean): Unit =
        while (bb.position() + 8 <= end) {
          val id = cc()
          val size = bb.getInt & 0xFFFFFFFFL
          val next = bb.position() + size + (size % 2)
          if (next > end) return // truncated chunk: keep what demuxed so far
          val framePrefix = f"${if (vidsIdx >= 0) vidsIdx else 0}%02d"
          id match {
            case "LIST" =>
              val typ = cc()
              walk(next, inMovi || typ == "movi")
            case "avih" if size >= 4 =>
              val usPerFrame = bb.getInt & 0xFFFFFFFFL
              if (fps == 0 && usPerFrame > 0)
                fps = math.max(1, math.round(1e6 / usPerFrame)).toInt
            case "strh" if size >= 32 =>
              val typ = cc(); val _ = cc() // handler fourcc: payload-agnostic
              bb.getInt; bb.getShort; bb.getShort; bb.getInt
              val scale = bb.getInt & 0xFFFFFFFFL
              val rate = bb.getInt & 0xFFFFFFFFL
              if (typ == "vids" && vidsIdx < 0) {
                vidsIdx = streamIdx
                // NOTE: fps is an integer here (the VideoStream contract
                // shared with GVID); NTSC-style rational rates
                // (30000/1001 = 29.97) round to the nearest integer, so
                // ts_ms drifts ~1 ms per 30 frames on such files —
                // metadata precision, not frame loss.
                if (scale > 0 && rate > 0)
                  fps = math.max(1, math.round(rate.toDouble / scale)).toInt
              }
              streamIdx += 1
            case s if inMovi && s.length == 4 && s.startsWith(framePrefix) &&
                (s.endsWith("dc") || s.endsWith("db")) =>
              // size-0 chunks are real MJPEG dropped-frame placeholders:
              // emit them as empty payloads so frame_idx/ts_ms of every
              // later frame stay aligned with the container (the codec
              // drops the undecodable payload, not the position)
              val f = new Array[Byte](size.toInt)
              bb.get(f)
              frames += f
            case _ => () // idx1, JUNK, other streams: skip
          }
          bb.position(next.toInt)
        }
      walk(8L + riffSize, inMovi = false)
      if (fps <= 0 || frames.length > (1 << 20)) None
      else Some(VideoOps.VideoStream(fps, frames.toIndexedSeq))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic test AVI for `docId`: 2 + id%4 frames at 12 fps,
    * frame f = [[MediaOps.testPngBytes]] of the derived id
    * 11·docId + f — lossless payloads, so per-frame dimensions and
    * checksums keep the q42 closed forms at `fid = 11·doc_id +
    * frame_idx` through a REAL container demux. */
  def testAviBytes(docId: Long): Array[Byte] = {
    val n = 2 + (docId % 4).toInt
    mux(12, (0 until n).map(f => MediaOps.testPngBytes(11 * docId + f)))
  }

  /** (doc_id, content) table of [[testAviBytes]] containers, encoded
    * partition-parallel — the ingest half of the round-trip. */
  def aviTable(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => (id, testAviBytes(id))))
      .toDF("doc_id", "content")
  }

  /** Real-MJPEG fixture: a JPEG-encoded gradient per frame (the same
    * raster as [[MediaOps.testPngBytes]] at the derived id, re-encoded
    * lossy). Exercises the genuine MJPEG payload path — dimensions stay
    * exact; pixel values are codec-dependent, so specs compare against
    * an in-JVM reference decode, not a closed form. */
  def testMjpegBytes(docId: Long): Array[Byte] = {
    val n = 2 + (docId % 4).toInt
    val frames = (0 until n).map { f =>
      val png = MediaOps.testPngBytes(11 * docId + f)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    mux(12, frames)
  }
}
