package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) ingestion — the format web-scale corpora actually
  * arrive in (Common-Crawl publishes WARC; everything in this repo's
  * web limb starts downstream of it). In-repo like the container
  * demuxers: a spec-correct writer for fixtures and a total, linear
  * single-pass reader.
  *
  * Reader contract:
  *  - records = `WARC/<v>` header block (CRLF lines, terminated by a
  *    blank line) + `Content-Length` payload octets + CRLF CRLF;
  *  - `response` records with an `application/http` payload split at
  *    the first CRLF CRLF into HTTP headers (status parsed from the
  *    status line) and the entity BODY (the HTML);
  *  - the entity body is CHARSET-DECODED: structural parsing runs on
  *    the byte-preserving ISO-8859-1 view (1 byte = 1 char, so
  *    `Content-Length` offsets stay exact), then the body's BYTES are
  *    re-decoded per the HTTP `Content-Type` charset, else the HTML
  *    `<meta charset>` / `<meta http-equiv>` declaration (scanned in
  *    the first 2 KB, the browser convention), else sniffed — strict
  *    UTF-8 when the bytes are valid UTF-8 (real crawls are
  *    majority-UTF-8 and often undeclared), byte-preserving Latin-1
  *    otherwise. A declared-but-bogus charset label falls through to
  *    the sniff; a declared charset with malformed content decodes
  *    with U+FFFD replacement. Total either way, and byte-identical
  *    to the old reader on pure-ASCII corpora;
  *  - every other record type (warcinfo, request, metadata, …) is
  *    surfaced with an empty body — callers filter on `warc_type`;
  *  - whole-stream gzip (including multi-member, the
  *    one-member-per-record layout crawlers write) is detected by
  *    magic and inflated first; Java's GZIPInputStream handles member
  *    concatenation natively;
  *  - hostile input never throws: a malformed header block or a
  *    Content-Length past EOF ends the parse, keeping the records
  *    already read (the demuxer truncation convention).
  *
  * Scale shape: [[records]] is one `mapPartitions` over the archive
  * column — per-file linear work, no shuffle; the downstream chain
  * (URL canonicalization, HTML extraction) is likewise map-only, so a
  * crawl ingest touches no exchange until curation's first aggregate.
  */
object WarcIo {

  final case class WarcRecord(warc_type: String, target_uri: String,
                              http_status: Int, body: String)

  private val Crlf2 = "\r\n\r\n"

  /** Total parse of one WARC archive (plain or gzip'd). */
  def parse(bytes: Array[Byte]): IndexedSeq[WarcRecord] = {
    try {
      val data =
        if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B)
          gunzipAll(bytes)
        else bytes
      val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
      val text = new String(data, java.nio.charset.StandardCharsets.ISO_8859_1)
      var i = 0
      while (i >= 0 && i < text.length) {
        val start = text.indexOf("WARC/", i)
        if (start < 0) i = -1
        else {
          val hdrEnd = text.indexOf(Crlf2, start)
          if (hdrEnd < 0) i = -1
          else {
            val headers = text.substring(start, hdrEnd).split("\r\n").toIndexedSeq
            def header(name: String): Option[String] = headers
              .find(_.toLowerCase(java.util.Locale.ROOT)
                .startsWith(name.toLowerCase(java.util.Locale.ROOT) + ":"))
              .map(h => h.substring(h.indexOf(':') + 1).trim)
            val len = header("Content-Length").flatMap(_.toLongOption).getOrElse(-1L)
            val payloadStart = hdrEnd + Crlf2.length
            if (len < 0 || payloadStart + len > text.length) i = -1 // truncated
            else {
              val payload = text.substring(payloadStart, (payloadStart + len).toInt)
              val wtype = header("WARC-Type").getOrElse("unknown")
              val uri = header("WARC-Target-URI").getOrElse("")
              val isHttp = header("Content-Type")
                .exists(_.toLowerCase(java.util.Locale.ROOT).contains("application/http"))
              val (status, body) =
                if (wtype == "response" && isHttp) {
                  val split = payload.indexOf(Crlf2)
                  val httpHeaders = if (split < 0) payload else payload.substring(0, split)
                  val st = httpHeaders.split("\r\n").headOption
                    .flatMap(_.split(" ").lift(1)).flatMap(_.toIntOption).getOrElse(0)
                  val raw = if (split < 0) "" else payload.substring(split + Crlf2.length)
                  (st, decodeBody(raw, httpHeaders))
                } else (0, "")
              out += WarcRecord(wtype, uri, status, body)
              i = payloadStart + len.toInt
            }
          }
        }
      }
      out.toIndexedSeq
    } catch { case scala.util.control.NonFatal(_) => IndexedSeq.empty }
  }

  /** `charset=<label>` in an HTTP `Content-Type` header value or an
    * HTML `<meta charset=…>` / `<meta http-equiv … charset=…>` tag —
    * one pattern covers both shapes. */
  private val CharsetLabel =
    java.util.regex.Pattern.compile(
      "(?i)charset\\s*=\\s*[\"']?([A-Za-z0-9_.:+\\-]+)")

  /** Declared charset of a response: HTTP header first (authoritative
    * per RFC 9110), else a `<meta>` declaration in the first 2 KB of
    * the (byte-preserving Latin-1 view of the) body. */
  private[operators] def declaredCharset(httpHeaders: String,
                                         latin1Body: String): Option[String] = {
    val fromHttp = httpHeaders.split("\r\n")
      .find(_.toLowerCase(java.util.Locale.ROOT).startsWith("content-type:"))
      .flatMap { h =>
        val m = CharsetLabel.matcher(h)
        if (m.find()) Some(m.group(1)) else None
      }
    fromHttp.orElse {
      // HTML5-prescan discipline: a charset label only counts INSIDE a
      // <meta …> tag's bounds — a URL or text like <a href="?charset=…">
      // appearing earlier in the head must not win.
      val head = latin1Body.substring(0, math.min(latin1Body.length, 2048))
      val lower = head.toLowerCase(java.util.Locale.ROOT)
      var at = lower.indexOf("<meta")
      var found: Option[String] = None
      while (found.isEmpty && at >= 0) {
        val gt = head.indexOf('>', at)
        val tag = if (gt < 0) head.substring(at) else head.substring(at, gt + 1)
        val m = CharsetLabel.matcher(tag)
        if (m.find()) found = Some(m.group(1))
        at = lower.indexOf("<meta", at + 5)
      }
      found
    }
  }

  /** True when `cs` decodes ASCII bytes to themselves (the RFC 9110
    * "ASCII-compatible" families). UTF-16/32 and EBCDIC code pages are
    * not — an all-ASCII-range byte body declared in one of those must
    * still be decoded per its label, never short-circuited. */
  private def asciiCompatible(cs: java.nio.charset.Charset): Boolean = {
    val probe = "Ab0<&; \r\n"
    try new String(probe.getBytes(
      java.nio.charset.StandardCharsets.US_ASCII), cs) == probe
    catch { case _: Exception => false }
  }

  /** Re-decode an entity body from its byte-preserving Latin-1 parse
    * view into real text (see the reader contract above). ASCII bodies
    * short-circuit unchanged, so the fast path — and every pre-r18
    * fixture — is byte-identical. */
  private[operators] def decodeBody(latin1Body: String,
                                    httpHeaders: String): String = {
    val declared = declaredCharset(httpHeaders, latin1Body).flatMap { label =>
      try Some(java.nio.charset.Charset.forName(label))
      catch { case _: Exception => None } // bogus label → sniff below
    }
    var ascii = true
    var j = 0
    while (ascii && j < latin1Body.length) {
      if (latin1Body.charAt(j) >= 0x80) ascii = false
      j += 1
    }
    // The shortcut is only sound for ASCII-compatible declarations:
    // ASCII text in utf-16 interleaves 0x00 bytes all < 0x80, and the
    // declared label — not the byte view — is authoritative.
    if (ascii && declared.forall(asciiCompatible)) return latin1Body
    val bytes = latin1Body.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    declared match {
      case Some(cs) => new String(bytes, cs) // malformed input → U+FFFD
      case None =>
        try { // sniff: strict UTF-8, else keep the byte-preserving view
          val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
            .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
            .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
          dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
        } catch {
          case _: java.nio.charset.CharacterCodingException => latin1Body
        }
    }
  }

  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  final case class ArchiveRecord(file_id: Long, warc_type: String,
                                 target_uri: String, http_status: Int,
                                 body: String)

  /** Parse a (file_id, content BINARY) archive column into one row per
    * WARC record. Partition-parallel, no shuffle. */
  def records(archives: DataFrame, idCol: String = "file_id",
              contentCol: String = "content"): Dataset[ArchiveRecord] = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.select(col(idCol).cast("long"), col(contentCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (fid, bytes) =>
          parse(if (bytes == null) Array.empty[Byte] else bytes)
            .map(r => ArchiveRecord(fid, r.warc_type, r.target_uri,
              r.http_status, r.body))
        }
      }
  }

  /** The 200-response page rows a crawl pipeline consumes:
    * (target_uri, html). */
  def pages(archives: DataFrame, idCol: String = "file_id",
            contentCol: String = "content"): DataFrame =
    records(archives, idCol, contentCol).toDF()
      .filter(col("warc_type") === "response" && col("http_status") === 200)
      .select(col("target_uri"), col("body").as("html"))

  // ----------------------------------------------------------- fixtures

  private def record(headers: Seq[(String, String)], payload: String): String = {
    val h = (("WARC/1.0" +: headers.map { case (k, v) => s"$k: $v" })
      :+ s"Content-Length: ${payload.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1).length}")
      .mkString("\r\n")
    h + Crlf2 + payload + Crlf2
  }

  /** Spec-correct WARC writer: a warcinfo record, then per page a
    * request/response pair (the crawler layout) — response payload is a
    * full HTTP/1.1 message whose entity body is the HTML, encoded as
    * UTF-8 OCTETS (held in the byte-preserving Latin-1 view so
    * `Content-Length` counts bytes; ASCII pages are byte-identical to
    * the pre-r18 writer). Charset-declaration mode per page:
    * 0 = `charset=utf-8` on the HTTP `Content-Type` (the common case),
    * 1 = bare `text/html` (the page declares via `<meta charset>`),
    * 2 = bare `text/html` and no meta — the reader must sniff. */
  def mux(pagesSeq: Seq[(String, String)], gzip: Boolean = false): Array[Byte] =
    muxModes(pagesSeq.map { case (u, h) => (u, h, 0) }, gzip)

  def muxModes(pagesSeq: Seq[(String, String, Int)],
               gzip: Boolean = false): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000000>",
      "Content-Type" -> "application/warc-fields"),
      "software: graft-fixture-writer/1.0\r\n"))
    pagesSeq.foreach { case (uri, html, mode) =>
      sb.append(record(Seq(
        "WARC-Type" -> "request",
        "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=request"),
        s"GET $uri HTTP/1.1\r\nHost: fixture\r\n\r\n"))
      val contentType =
        if (mode == 0) "text/html; charset=utf-8" else "text/html"
      val bodyWire = new String(
        html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val http = s"HTTP/1.1 200 OK\r\nContent-Type: $contentType" +
        Crlf2 + bodyWire
      sb.append(record(Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
        http))
    }
    val raw = sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!gzip) raw
    else {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(raw); g.close()
      out.toByteArray
    }
  }

  /** Synthetic doc ids for the per-archive multibyte page sit above any
    * real corpus id so the two ranges never collide. */
  val IntlDocBase = 1000000000L

  /** Pages per fixture archive. The q151 oracle's `doc_id // N` fid
    * derivation interpolates THIS constant — change it here and the
    * oracle follows; never restate the literal. */
  val DefaultDocsPerFile = 4

  /** The multibyte fixture page text: 8 words mixing accented Latin and
    * CJK — closed-form for the oracle
    * (`'Café número ' || fid || ' 你好 世界 naïve résumé données'`). */
  def intlText(fid: Long): String =
    s"Café número $fid 你好 世界 naïve résumé données"

  /** Clean URL for the multibyte page (no mangling — the charset path
    * is what's under test; canonicalization passes it through). */
  def intlUrl(fid: Long): String =
    s"https://intl.example.org/Articles/Item${IntlDocBase + fid}?page=2"

  /** (file_id, content) WARC archives over the documents relation:
    * `docsPerFile` pages per archive (file_id = doc_id / docsPerFile),
    * page URI = [[UrlOps.testUrl]], page HTML = [[HtmlExtract.testHtml]]
    * — every doc's web identity derives from its id, so the whole
    * WARC → URL → extraction chain stays closed-form. Every second
    * archive is written whole-stream-gzip'd (the Common-Crawl layout),
    * exercising both reader paths in one corpus. Each archive also
    * carries one MULTIBYTE page ([[intlText]], doc id
    * [[IntlDocBase]]+fid) whose charset declaration rotates by
    * fid%3 — HTTP header / `<meta charset>` / undeclared-sniff — so
    * all three decode paths run against real non-ASCII content. The
    * gzip cycle (fid%2) is deliberately coprime to the charset cycle
    * (fid%3): over a 6-archive period every decode mode runs through
    * BOTH reader paths end-to-end (r18 had them correlated — gzip'd
    * archives only ever carried header-declared intl pages). */
  def warcTable(documents: DataFrame,
                docsPerFile: Int = DefaultDocsPerFile): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)]
      .groupByKey(_._1 / docsPerFile)
      .mapGroups { (fid, it) =>
        val pagesSeq = it.toSeq.sortBy(_._1).map { case (id, text) =>
          (UrlOps.testUrl(id), HtmlExtract.testHtml(id, text), 0)
        }
        val intlHtml0 = HtmlExtract.testHtml(IntlDocBase + fid, intlText(fid))
        val intl = (fid % 3) match {
          case 0 => (intlUrl(fid), intlHtml0, 0)
          case 1 => (intlUrl(fid),
            intlHtml0.replaceFirst("<head>", "<head><meta charset=\"UTF-8\">"), 1)
          case _ => (intlUrl(fid), intlHtml0, 2)
        }
        (fid, muxModes(pagesSeq :+ intl, gzip = fid % 2 == 0))
      }
      .toDF("file_id", "content")
  }
}
