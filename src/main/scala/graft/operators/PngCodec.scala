package graft.operators

/** Minimal lock-free PNG decoder — the per-task fast path of
  * [[MediaOps.ImageIoCodec]].
  *
  * Why it exists: `javax.imageio.ImageIO.read` synchronizes on the global
  * `IIORegistry` (SPI lookup, stream creation) on EVERY call, so decode
  * throughput is capped near single-core speed regardless of task
  * parallelism — measured on this box: 32 decode threads deliver only
  * ~1.5× one thread's images/sec. Every media arm of the curation
  * pipeline (image integrity, perceptual hashing, per-frame video decode)
  * is a partition-parallel decode pass, so at 32 cores the registry lock
  * IS the stage. This decoder is pure per-call code — no globals, no
  * locks — and scales linearly with cores.
  *
  * Exactness contract: it decodes ONLY the fully-standard subset it can
  * reproduce bit-for-bit against the ImageIO path —
  *  - 8-bit samples, non-interlaced,
  *  - color type 0 (grayscale), 2 (RGB) or 6 (RGBA),
  *  - no pixel-affecting ancillary chunks (PLTE/tRNS/gAMA/iCCP/sRGB/sBIT
  *    force the fallback),
  *  - every consumed chunk CRC-verified, zlib stream fully consumed and
  *    exactly scanline-sized.
  * Anything else returns None and the caller falls back to ImageIO, so
  * the decode VERDICT (ok vs failed) and the decoded pixels of
  * [[MediaOps.ImageIoCodec]] are unchanged by construction: grayscale
  * rasters pass raw samples through; RGB/RGBA collapse by the same
  * integer ITU-R 601 formula the ImageIO path applies to `getRGB`
  * values. Parity is property-pinned in MediaSpec.
  */
private[graft] object PngCodec {

  private val Magic = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  /** Pixel-count cap for the fast path: beyond this the raster is let
    * through to ImageIO (bounds the single allocation; 64 MP is far past
    * every pipeline fixture and most web imagery). */
  private val MaxPixels = 64L * 1024 * 1024

  private def be32(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xFF) << 24) | ((a(off + 1) & 0xFF) << 16) |
      ((a(off + 2) & 0xFF) << 8) | (a(off + 3) & 0xFF)

  /** None = not decodable by the fast path (caller falls back to
    * ImageIO); Some = bit-exact [[MediaOps.DecodedImage]]. */
  def decode(content: Array[Byte]): Option[MediaOps.DecodedImage] = {
    try decodeImpl(content)
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private def decodeImpl(a: Array[Byte]): Option[MediaOps.DecodedImage] = {
    if (a.length < 8 + 25) return None // magic + IHDR chunk minimum
    var i = 0
    while (i < 8) { if (a(i) != Magic(i)) return None; i += 1 }

    var pos = 8
    var w = 0
    var h = 0
    var colorType = -1
    var sawIhdr = false
    var sawIend = false
    // IDAT payload slices, concatenated after the chunk walk
    val idats = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var idatLen = 0
    val crc = new java.util.zip.CRC32

    while (!sawIend) {
      if (pos + 8 > a.length) return None
      val len = be32(a, pos)
      if (len < 0 || pos + 12 + len > a.length) return None
      val t0 = a(pos + 4); val t1 = a(pos + 5); val t2 = a(pos + 6); val t3 = a(pos + 7)
      def isType(s: String): Boolean =
        t0 == s.charAt(0).toByte && t1 == s.charAt(1).toByte &&
          t2 == s.charAt(2).toByte && t3 == s.charAt(3).toByte
      // CRC covers type + data
      crc.reset()
      crc.update(a, pos + 4, 4 + len)
      if (crc.getValue.toInt != be32(a, pos + 8 + len)) return None
      if (isType("IHDR")) {
        if (sawIhdr || len != 13) return None
        sawIhdr = true
        w = be32(a, pos + 8)
        h = be32(a, pos + 12)
        val bitDepth = a(pos + 16) & 0xFF
        colorType = a(pos + 17) & 0xFF
        val compression = a(pos + 18) & 0xFF
        val filterMethod = a(pos + 19) & 0xFF
        val interlace = a(pos + 20) & 0xFF
        if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
        if (bitDepth != 8 || compression != 0 || filterMethod != 0 || interlace != 0)
          return None
        if (colorType != 0 && colorType != 2 && colorType != 6) return None
      } else if (isType("IDAT")) {
        if (!sawIhdr) return None
        idats += ((pos + 8, len))
        idatLen += len
      } else if (isType("IEND")) {
        if (len != 0) return None
        sawIend = true
      } else if (isType("PLTE") || isType("tRNS") || isType("gAMA") ||
                 isType("iCCP") || isType("sRGB") || isType("sBIT")) {
        // pixel-affecting (or potentially pixel-affecting) ancillary
        // chunks: let ImageIO rule so the fast path can never disagree
        return None
      }
      // other ancillary chunks (tEXt, tIME, pHYs, ...) are skipped
      pos += 12 + len
    }
    if (!sawIhdr || idats.isEmpty) return None

    val bpp = colorType match {
      case 0 => 1
      case 2 => 3
      case _ => 4
    }
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)

    // single zlib stream across the concatenated IDAT payloads; must
    // decompress to EXACTLY the scanline mass and terminate cleanly
    val inf = new java.util.zip.Inflater()
    try {
      var out = 0
      var ci = 0
      while (ci < idats.length && !inf.finished()) {
        val (off, len) = idats(ci)
        inf.setInput(a, off, len)
        while (!inf.needsInput() && !inf.finished()) {
          if (out == raw.length) {
            // more compressed data than scanlines — only acceptable if
            // it inflates to nothing further
            val probe = inf.inflate(new Array[Byte](1), 0, 1)
            if (probe != 0 || inf.needsDictionary()) return None
            if (!inf.finished() && !inf.needsInput()) return None
          } else {
            val n = inf.inflate(raw, out, raw.length - out)
            if (n == 0 && inf.needsDictionary()) return None
            out += n
          }
        }
        ci += 1
      }
      if (!inf.finished() || out != raw.length) return None
    } finally inf.end()

    // per-scanline unfilter, in place over a parallel output array
    val px = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val fIn = y * (stride + 1)
      val filter = raw(fIn) & 0xFF
      val rowIn = fIn + 1
      val rowOut = y * stride
      val prevOut = rowOut - stride
      filter match {
        case 0 =>
          System.arraycopy(raw, rowIn, px, rowOut, stride)
        case 1 =>
          var x = 0
          while (x < stride) {
            val left = if (x >= bpp) px(rowOut + x - bpp) & 0xFF else 0
            px(rowOut + x) = ((raw(rowIn + x) + left) & 0xFF).toByte
            x += 1
          }
        case 2 =>
          var x = 0
          while (x < stride) {
            val up = if (y > 0) px(prevOut + x) & 0xFF else 0
            px(rowOut + x) = ((raw(rowIn + x) + up) & 0xFF).toByte
            x += 1
          }
        case 3 =>
          var x = 0
          while (x < stride) {
            val left = if (x >= bpp) px(rowOut + x - bpp) & 0xFF else 0
            val up = if (y > 0) px(prevOut + x) & 0xFF else 0
            px(rowOut + x) = ((raw(rowIn + x) + ((left + up) >> 1)) & 0xFF).toByte
            x += 1
          }
        case 4 =>
          var x = 0
          while (x < stride) {
            val left = if (x >= bpp) px(rowOut + x - bpp) & 0xFF else 0
            val up = if (y > 0) px(prevOut + x) & 0xFF else 0
            val ul = if (y > 0 && x >= bpp) px(prevOut + x - bpp) & 0xFF else 0
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            px(rowOut + x) = ((raw(rowIn + x) + pred) & 0xFF).toByte
            x += 1
          }
        case _ => return None
      }
      y += 1
    }

    // luminance mapping — identical to the ImageIO path's two lanes:
    // single-band 8-bit grayscale passes raw samples; RGB(A) collapses
    // with the integer ITU-R 601 formula over getRGB-equivalent values
    val gray = new Array[Int](w * h)
    colorType match {
      case 0 =>
        var i2 = 0
        while (i2 < gray.length) { gray(i2) = px(i2) & 0xFF; i2 += 1 }
      case _ =>
        var p = 0
        var i2 = 0
        while (i2 < gray.length) {
          val r = px(p) & 0xFF
          val g = px(p + 1) & 0xFF
          val b = px(p + 2) & 0xFF
          gray(i2) = (r * 299 + g * 587 + b * 114) / 1000
          p += bpp
          i2 += 1
        }
    }
    Some(MediaOps.DecodedImage(w, h, gray))
  }
}
