package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaOps, PngCodec}

/** Parity pin for the lock-free PNG fast path ([[PngCodec]]): on every
  * image the fast path accepts, its pixels must be BIT-IDENTICAL to the
  * pure-ImageIO decode (the pre-r21 [[MediaOps.ImageIoCodec]] body), and
  * on every nonstandard/corrupt input it must decline (None) so the
  * ImageIO fallback keeps the decode verdict unchanged. */
class PngCodecSpec extends AnyFunSuite {

  /** The pre-fast-path ImageIO decode, verbatim — the parity reference. */
  private def imageIoDecode(content: Array[Byte]): Option[MediaOps.DecodedImage] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val gray = new Array[Int](w * h)
      val raster = img.getRaster
      if (raster.getNumBands == 1 && raster.getSampleModel.getSampleSize(0) == 8) {
        raster.getSamples(0, 0, w, h, 0, gray)
      } else {
        var y = 0
        var i = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF
            val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            gray(i) = (r * 299 + g * 587 + b * 114) / 1000
            x += 1; i += 1
          }
          y += 1
        }
      }
      Some(MediaOps.DecodedImage(w, h, gray))
    }
  }

  private def assertParity(bytes: Array[Byte], label: String): Unit = {
    val fast = PngCodec.decode(bytes)
    assert(fast.isDefined, s"$label: fast path should accept this standard PNG")
    val ref = imageIoDecode(bytes).get
    assert(fast.get.width == ref.width && fast.get.height == ref.height, label)
    assert(fast.get.gray.sameElements(ref.gray), s"$label: pixel mismatch")
  }

  private def imageIoPng(tpe: Int, w: Int, h: Int, seed: Long): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val img = new java.awt.image.BufferedImage(w, h, tpe)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (tpe == java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          img.getRaster.setSample(x, y, 0, rnd.nextInt(256))
        else img.setRGB(x, y, rnd.nextInt())
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("parity on ImageIO-encoded grayscale / RGB / ARGB PNGs") {
    for (seed <- 0L until 20L; (w, h) <- Seq((16, 12), (23, 16), (1, 1), (64, 3)))
      assertParity(imageIoPng(java.awt.image.BufferedImage.TYPE_BYTE_GRAY, w, h, seed),
        s"gray $w x $h seed=$seed")
    for (seed <- 0L until 10L; (w, h) <- Seq((17, 9), (8, 8)))
      assertParity(imageIoPng(java.awt.image.BufferedImage.TYPE_INT_RGB, w, h, seed),
        s"rgb $w x $h seed=$seed")
    for (seed <- 0L until 10L)
      assertParity(imageIoPng(java.awt.image.BufferedImage.TYPE_INT_ARGB, 13, 7, seed),
        s"argb seed=$seed")
  }

  test("parity on the pipeline fixtures") {
    for (id <- 0L until 64L) {
      assertParity(MediaOps.testPngBytes(id), s"testPng $id")
      assertParity(MediaOps.constPngBytes(id, 100), s"constPng $id")
    }
  }

  /** Hand-built PNG with a CHOSEN filter per scanline — ImageIO's writer
    * picks its own filters, so this is the only way to pin all five
    * unfilter lanes. */
  private def buildPng(w: Int, h: Int, colorType: Int, filter: Int,
                       seed: Long): Array[Byte] = {
    val bpp = colorType match { case 0 => 1; case 2 => 3; case 6 => 4 }
    val rnd = new scala.util.Random(seed)
    val px = Array.fill[Byte](w * h * bpp)(rnd.nextInt(256).toByte)
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      raw(y * (stride + 1)) = filter.toByte
      var x = 0
      while (x < stride) {
        val cur = px(y * stride + x) & 0xFF
        val left = if (x >= bpp) px(y * stride + x - bpp) & 0xFF else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xFF else 0
        val ul = if (y > 0 && x >= bpp) px((y - 1) * stride + x - bpp) & 0xFF else 0
        val enc = filter match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            cur - pred
        }
        raw(y * (stride + 1) + 1 + x) = (enc & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val len = data.length
      out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte))
      val body = tpe.getBytes("US-ASCII") ++ data
      out.write(body)
      val crc = new java.util.zip.CRC32
      crc.update(body)
      val c = crc.getValue.toInt
      out.write(Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte))
      out.toByteArray
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
    ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte
    ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType.toByte
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", comp.toByteArray) ++
      chunk("IEND", Array.empty)
  }

  test("parity across all five filter types, gray and RGB and RGBA") {
    for (filter <- 0 to 4; colorType <- Seq(0, 2, 6)) {
      val bytes = buildPng(19, 11, colorType, filter, seed = filter * 10L + colorType)
      assertParity(bytes, s"filter=$filter colorType=$colorType")
    }
  }

  test("declines corrupt and nonstandard inputs (fallback keeps the ImageIO verdict)") {
    assert(PngCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(PngCodec.decode("not an image".getBytes).isEmpty)
    // bad CRC: flip one IDAT payload byte
    val good = buildPng(9, 7, 0, 1, seed = 42L)
    val bad = good.clone()
    bad(bad.length - 20) = (bad(bad.length - 20) ^ 0x5A).toByte
    assert(PngCodec.decode(bad).isEmpty)
    // truncated
    assert(PngCodec.decode(good.take(good.length - 8)).isEmpty)
    // 16-bit PNG (nonstandard for the fast path; ImageIO still decodes it)
    val img16 = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val out16 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img16, "png", out16)
    assert(PngCodec.decode(out16.toByteArray).isEmpty)
    assert(imageIoDecode(out16.toByteArray).isDefined)
    // and the public codec still decodes everything ImageIO can
    assert(MediaOps.ImageIoCodec.decode(out16.toByteArray).isDefined)
  }

  test("decode scales with threads (the lock-free point)") {
    // smoke, not a benchmark: concurrent decodes must succeed and agree
    val imgs = (0L until 64L).map(MediaOps.testPngBytes)
    val refs = imgs.map(b => PngCodec.decode(b).get.gray.toSeq)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = (0 until 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          override def call(): Boolean =
            imgs.zip(refs).forall { case (b, r) =>
              PngCodec.decode(b).get.gray.toSeq == r
            }
        })
      }
      assert(futs.forall(_.get()))
    } finally pool.shutdown()
  }
}
