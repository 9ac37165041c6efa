package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-repo ISO BMFF (MP4) demuxer — the second real-container leg of
  * the video modality (after [[AviContainer]], closing the README's
  * "MP4 demuxer" future-work line): parses the actual ISO/IEC 14496-12
  * box tree (`ftyp mdat moov(mvhd trak(tkhd mdia(mdhd hdlr minf(stbl(
  * stsd stts stsc stsz stco)))))`) that QuickTime motion-JPEG files
  * use, so a user with real `.mp4`/`.mov` MJPEG files runs the SAME
  * downstream plan ([[VideoOps.decodeFrames]]) with
  * `container = Mp4Container` and nothing else changes.
  *
  * Parser shape: one recursive descent over the box tree (big-endian,
  * 64-bit `largesize` and to-end-of-file sizes handled), then a sample
  * walk — the FIRST track whose `hdlr` is `vide` contributes samples
  * (audio-first files keep working); per-sample file offsets come from
  * the `stsc` sample-to-chunk runs expanded over `stco`/`co64` chunk
  * offsets with `stsz` sizes, exactly the table join a real player
  * performs. fps = round(`mdhd` media timescale / first `stts` delta)
  * — integer per the [[VideoOps.VideoStream]] contract (same rounding
  * note as AVI's NTSC caveat). `mdat` itself is never parsed: chunk
  * offsets are file-absolute, so samples are sliced straight from the
  * buffer. Corrupt/truncated containers → None (dropped, not fatal);
  * samples pointing past EOF stop the walk, keeping what demuxed —
  * the [[VideoOps.VideoContainer]] contract.
  *
  * Sample payloads are handed to the pluggable image codec untouched:
  * the muxer writes a `jpeg` VisualSampleEntry (the QuickTime
  * motion-JPEG layout, one self-contained JPEG per sample), which
  * decodes through `javax.imageio`'s genuine JPEG reader; the
  * deterministic fixture stores lossless PNG payloads in the same
  * container so closed-form pixel checksums stay oracle-expressible
  * (the demuxer never inspects sample bytes — the stsd entry describes
  * them, downstream codecs sniff them).
  */
object Mp4Container extends VideoOps.VideoContainer {

  // ---------------------------------------------------------------- mux

  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def u32(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt((v & 0xFFFFFFFFL).toInt).array()
  private def u16(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(2).putShort(v.toShort).array()
  private def box(typ: String, body: Array[Byte]*): Array[Byte] = {
    val len = 8L + body.map(_.length.toLong).sum
    u32(len) ++ cc(typ) ++ body.flatten
  }
  private val UnityMatrix: Array[Byte] =
    u32(0x10000) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(0x10000) ++ u32(0) ++
      u32(0) ++ u32(0) ++ u32(0x40000000)

  /** Minimal spec-correct MP4 writer (the test/ingest half of the
    * round-trip): `ftyp` + `mdat` + `moov`, one `vide` track with a
    * `jpeg` sample entry, `samplesPerChunk` samples per chunk (1 =
    * ffmpeg's un-interleaved shape; >1 exercises the stsc run
    * expansion, with a run-length-encoded stsc covering a short last
    * chunk), media timescale = fps so every `stts` delta is exactly 1.
    * `width`/`height` are the nominal raster in tkhd/stsd; per-sample
    * payloads are self-describing images, so a mixed-dimension fixture
    * stays decodable. */
  def mux(fps: Int, frames: Seq[Array[Byte]], width: Int = 32, height: Int = 24,
          samplesPerChunk: Int = 1): Array[Byte] = {
    require(fps > 0, s"fps must be positive, got $fps")
    require(samplesPerChunk >= 1, s"samplesPerChunk must be >= 1, got $samplesPerChunk")
    val n = frames.length
    val ftyp = box("ftyp", cc("isom"), u32(0x200), cc("isom"), cc("iso2"), cc("mp41"))
    // chunk offsets are file-absolute: ftyp, then mdat's 8-byte header
    val mdatPayloadAt = ftyp.length + 8L
    val chunks = frames.grouped(samplesPerChunk).toArray
    val offsets = chunks.scanLeft(mdatPayloadAt)((acc, c) => acc + c.map(_.length.toLong).sum).init
    // run-length-encoded sample-to-chunk map (covers a short last chunk)
    val stscEntries = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    chunks.zipWithIndex.foreach { case (c, i) =>
      if (stscEntries.isEmpty || stscEntries.last._2 != c.length.toLong)
        stscEntries += ((i + 1L, c.length.toLong))
    }
    val mdat = box("mdat", frames.flatten.toArray)
    val movieTs = 1000L
    val movieDur = if (n == 0) 0L else math.round(n * movieTs.toDouble / fps)
    val mvhd = box("mvhd", u32(0) /* v0+flags */ ,
      u32(0), u32(0), u32(movieTs), u32(movieDur), u32(0x00010000), u16(0x0100),
      u16(0), u32(0), u32(0), UnityMatrix,
      u32(0), u32(0), u32(0), u32(0), u32(0), u32(0), u32(2) /* next track */)
    val tkhd = box("tkhd", u32(3) /* v0, enabled+in-movie */ ,
      u32(0), u32(0), u32(1) /* track_ID */ , u32(0), u32(movieDur),
      u32(0), u32(0), u16(0), u16(0), u16(0), u16(0), UnityMatrix,
      u32(width.toLong << 16), u32(height.toLong << 16))
    val mdhd = box("mdhd", u32(0),
      u32(0), u32(0), u32(fps) /* media timescale */ , u32(n) /* duration */ ,
      u16(0x55C4) /* 'und' */ , u16(0))
    val hdlr = box("hdlr", u32(0), u32(0), cc("vide"), u32(0), u32(0), u32(0),
      "GraftVideo".getBytes("US-ASCII") ++ Array[Byte](0))
    val vmhd = box("vmhd", u32(1), u16(0), u16(0), u16(0), u16(0))
    val dinf = box("dinf", box("dref", u32(0), u32(1),
      box("url ", u32(1) /* self-contained */)))
    // 'jpeg' VisualSampleEntry: QuickTime motion-JPEG, one JPEG per sample
    val sampleEntry = box("jpeg",
      Array.fill[Byte](6)(0), u16(1) /* data_reference_index */ ,
      u16(0), u16(0), u32(0), u32(0), u32(0),
      u16(width), u16(height), u32(0x00480000), u32(0x00480000), u32(0),
      u16(1) /* frame_count */ ,
      { val name = "Motion JPEG".getBytes("US-ASCII")
        Array(name.length.toByte) ++ name ++ Array.fill[Byte](31 - name.length)(0) },
      u16(24), u16(0xFFFF) /* pre_defined = -1 */)
    val stsd = box("stsd", u32(0), u32(1), sampleEntry)
    val stts = box("stts", u32(0), u32(if (n == 0) 0 else 1),
      if (n == 0) Array.emptyByteArray else u32(n) ++ u32(1))
    val stsc = box("stsc", u32(0), u32(stscEntries.length.toLong),
      stscEntries.toArray.flatMap { case (first, spc) => u32(first) ++ u32(spc) ++ u32(1) })
    val stsz = box("stsz", u32(0), u32(0) /* per-sample sizes */ , u32(n),
      frames.toArray.flatMap(f => u32(f.length.toLong)))
    val stco = box("stco", u32(0), u32(chunks.length.toLong), offsets.flatMap(u32))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }

  // -------------------------------------------------------------- demux

  override def demux(bytes: Array[Byte]): Option[VideoOps.VideoStream] =
    try {
      if (bytes.length < 16) return None
      val bb = java.nio.ByteBuffer.wrap(bytes) // ISO BMFF is big-endian
      def fourccAt(): String = {
        val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
      }
      // per-candidate-track sample tables, committed when hdlr says vide
      var videDone = false
      var trakHdlr = ""
      var trakTimescale = 0L
      var trakSttsDelta = 0L
      var sizes: Array[Long] = null
      var chunkOffsets: Array[Long] = null
      var stscRuns: Array[(Long, Long)] = null // (first_chunk, samples_per_chunk)
      var timescale = 0L
      var sttsDelta = 0L
      var vSizes: Array[Long] = null
      var vChunks: Array[Long] = null
      var vRuns: Array[(Long, Long)] = null

      val containers = Set("moov", "trak", "mdia", "minf", "stbl")
      def walk(end: Long): Unit =
        while (!videDone && bb.position() + 8 <= end) {
          val start = bb.position().toLong
          var size = (bb.getInt & 0xFFFFFFFFL)
          val typ = fourccAt()
          if (size == 1) { size = bb.getLong; if (size < 16) return }
          else if (size == 0) size = end - start
          else if (size < 8) return
          val next = start + size
          if (next > end) return // truncated box: stop this level
          typ match {
            case "trak" =>
              trakHdlr = ""; trakTimescale = 0L; trakSttsDelta = 0L
              sizes = null; chunkOffsets = null; stscRuns = null
              walk(next)
              if (!videDone && trakHdlr == "vide" && sizes != null &&
                  chunkOffsets != null) {
                timescale = trakTimescale; sttsDelta = trakSttsDelta
                vSizes = sizes; vChunks = chunkOffsets
                vRuns = if (stscRuns == null) Array((1L, 1L)) else stscRuns
                videDone = true
              }
            case t if containers(t) => walk(next)
            case "mdhd" if size >= 8 + 4 =>
              val ver = bb.get(); bb.get(); bb.getShort() // version + flags
              if (ver == 1) { bb.getLong; bb.getLong; trakTimescale = bb.getInt & 0xFFFFFFFFL }
              else { bb.getInt; bb.getInt; trakTimescale = bb.getInt & 0xFFFFFFFFL }
            case "hdlr" if size >= 8 + 12 =>
              bb.getInt; bb.getInt // version+flags, pre_defined
              trakHdlr = fourccAt()
            case "stts" if size >= 8 + 8 =>
              bb.getInt
              val cnt = bb.getInt & 0xFFFFFFFFL
              if (cnt >= 1) { bb.getInt; trakSttsDelta = bb.getInt & 0xFFFFFFFFL }
            case "stsz" if size >= 8 + 12 =>
              bb.getInt
              val fixed = bb.getInt & 0xFFFFFFFFL
              val cnt = (bb.getInt & 0xFFFFFFFFL).toInt
              if (cnt >= 0 && cnt <= (1 << 20))
                sizes =
                  if (fixed != 0) Array.fill(cnt)(fixed)
                  else Array.fill(cnt)(bb.getInt & 0xFFFFFFFFL)
            case "stsc" if size >= 8 + 4 =>
              bb.getInt
              val cnt = (bb.getInt & 0xFFFFFFFFL).toInt
              if (cnt >= 0 && cnt <= (1 << 20))
                stscRuns = Array.fill(cnt) {
                  val first = bb.getInt & 0xFFFFFFFFL
                  val spc = bb.getInt & 0xFFFFFFFFL
                  bb.getInt // sample_description_index
                  (first, spc)
                }
            case "stco" if size >= 8 + 4 =>
              bb.getInt
              val cnt = (bb.getInt & 0xFFFFFFFFL).toInt
              if (cnt >= 0 && cnt <= (1 << 20))
                chunkOffsets = Array.fill(cnt)(bb.getInt & 0xFFFFFFFFL)
            case "co64" if size >= 8 + 4 =>
              bb.getInt
              val cnt = (bb.getInt & 0xFFFFFFFFL).toInt
              if (cnt >= 0 && cnt <= (1 << 20))
                chunkOffsets = Array.fill(cnt)(bb.getLong)
            case _ => () // ftyp, mdat, free, udta, other codec/track boxes
          }
          bb.position(next.toInt)
        }
      walk(bytes.length.toLong)
      if (!videDone || timescale <= 0 || vSizes.length > (1 << 20)) return None

      // expand stsc runs over the chunk list; slice samples from the file
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var sample = 0
      var run = 0
      var chunk = 0
      while (chunk < vChunks.length && sample < vSizes.length) {
        while (run + 1 < vRuns.length && vRuns(run + 1)._1 <= chunk + 1) run += 1
        val spc = math.min(vRuns(run)._2, vSizes.length.toLong).toInt
        var off = vChunks(chunk)
        var j = 0
        while (j < spc && sample < vSizes.length) {
          val len = vSizes(sample)
          if (off < 0 || len < 0 || len > Int.MaxValue || off + len > bytes.length)
            { chunk = vChunks.length; j = spc } // past EOF: keep what demuxed
          else {
            val f = new Array[Byte](len.toInt)
            System.arraycopy(bytes, off.toInt, f, 0, len.toInt)
            frames += f
            off += len; sample += 1; j += 1
          }
        }
        chunk += 1
      }
      // fps = timescale / delta; an empty stream has no deltas, but the
      // muxer's timescale IS the frame rate (delta 1), so fall back to it
      val fps =
        if (sttsDelta > 0) math.max(1, math.round(timescale.toDouble / sttsDelta)).toInt
        else math.min(timescale, Int.MaxValue.toLong).toInt
      Some(VideoOps.VideoStream(fps, frames.toIndexedSeq))
    } catch { case scala.util.control.NonFatal(_) => None }

  // ----------------------------------------------------------- fixtures

  /** Deterministic test MP4 for `docId`: 3 + id%3 frames at 8 fps,
    * frame f = [[MediaOps.testPngBytes]] of the derived id 13·docId + f
    * — lossless payloads, so per-frame dimensions and checksums keep
    * the q42 closed forms at `fid = 13·doc_id + frame_idx` through a
    * REAL ISO BMFF demux; ts_ms = frame_idx · 125 exactly. */
  def testMp4Bytes(docId: Long): Array[Byte] = {
    val n = 3 + (docId % 3).toInt
    mux(8, (0 until n).map(f => MediaOps.testPngBytes(13 * docId + f)))
  }

  /** (doc_id, content) table of [[testMp4Bytes]] containers, encoded
    * partition-parallel — the ingest half of the round-trip. */
  def mp4Table(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => (id, testMp4Bytes(id))))
      .toDF("doc_id", "content")
  }

  /** Real-MJPEG fixture: a JPEG-encoded gradient per sample (the same
    * raster as [[MediaOps.testPngBytes]] at the derived id, re-encoded
    * lossy) under the `jpeg` sample entry — the genuine QuickTime
    * motion-JPEG layout. Dimensions stay exact; pixel values are
    * codec-dependent, so specs compare against an in-JVM reference
    * decode, not a closed form. */
  def testJpegMp4Bytes(docId: Long): Array[Byte] = {
    val n = 3 + (docId % 3).toInt
    val frames = (0 until n).map { f =>
      val png = MediaOps.testPngBytes(13 * docId + f)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    mux(8, frames)
  }
}
