package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the FIRST stage of a web-scale training-data
  * pipeline (Common-Crawl-style corpora arrive as markup, not clean
  * text). Deterministic, dependency-free, and built like the container
  * demuxers: an in-repo single-pass parser over public structure (the
  * WHATWG tag vocabulary), closed-form fixtures, and extraction rules
  * simple enough to be oracle-expressible.
  *
  * The model is jusText/trafilatura-class block classification:
  *
  *  1. one linear scan segments the document into BLOCKS at block-level
  *     tag boundaries (`p div h1…h6 li td blockquote pre article …`),
  *     dropping `script/style/noscript/template` subtrees entirely and
  *     flagging blocks inside `nav/header/footer/aside` as boilerplate
  *     ZONES (the semantic-HTML5 shortcut real extractors take first);
  *  2. per block, the scan accumulates the signals the classifier
  *     needs — word count, link count, and the character mass inside
  *     `<a>` elements (link density = link chars / text chars, the
  *     single strongest boilerplate signal in the jusText evaluation);
  *  3. a block is CONTENT iff it is not in a zone, has ≥ `minWords`
  *     words, and link density ≤ `maxLinkDensity`. Extracted text is
  *     the content blocks joined in document order.
  *
  * Scale shape: [[extract]] is one `mapPartitions` over the raw column —
  * no shuffle, no driver state, embarrassingly parallel like the media
  * decode arms; at 100 TB the cost is one linear pass over the bytes.
  * The parser NEVER throws on hostile input (crawled HTML is the
  * definition of hostile): unbalanced tags clamp, truncation keeps the
  * blocks already segmented, garbage yields zero blocks — pinned by the
  * same corruption-fuzz discipline as the demuxers.
  */
object HtmlExtract {

  /** One segmented block: `zone` marks nav/header/footer/aside ancestry,
    * `link_chars`/`total_chars` count non-whitespace text characters
    * (inside `<a>` / overall) — the link-density operands. */
  final case class Block(block_idx: Int, zone: Boolean, text: String,
                         n_words: Int, n_links: Int,
                         link_chars: Int, total_chars: Int)

  /** Block-level boundary tags (WHATWG flow content that breaks lines
    * in every browser's default stylesheet, plus table/list structure). */
  private val BlockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "dl", "dt", "dd", "td", "th", "tr", "table", "thead", "tbody",
    "blockquote", "pre", "article", "section", "main", "figure",
    "figcaption", "form", "fieldset", "body", "html", "head", "title",
    "br", "hr", "nav", "header", "footer", "aside")

  /** Subtrees whose TEXT is never content (code/style payloads). */
  private val SkipTags: Set[String] = Set("script", "style", "noscript", "template")

  /** Boilerplate-zone containers: semantic HTML5 chrome. */
  private val ZoneTags: Set[String] = Set("nav", "header", "footer", "aside")

  /** Minimal entity decode for the names that actually occur in text
    * flow (full entity tables are rendering concerns, not extraction). */
  private def decodeEntity(name: String): Option[String] = name match {
    case "amp" => Some("&")
    case "lt" => Some("<")
    case "gt" => Some(">")
    case "quot" => Some("\"")
    case "apos" | "#39" => Some("'")
    case "nbsp" | "#160" => Some(" ")
    case _ =>
      if (name.startsWith("#")) {
        val cp =
          if (name.length > 1 && (name.charAt(1) == 'x' || name.charAt(1) == 'X'))
            scala.util.Try(Integer.parseInt(name.substring(2), 16)).toOption
          else scala.util.Try(Integer.parseInt(name.substring(1))).toOption
        cp.filter(c => c >= 0x20 && c <= 0x10FFFF && Character.isValidCodePoint(c))
          .map(c => new String(Character.toChars(c)))
      } else None
  }

  /** Single-pass block segmentation. Total (never throws) by
    * construction: every index advance is bounds-checked, tag-depth
    * counters clamp at zero, and an unterminated construct consumes the
    * rest of the input as text or silence. */
  def parseBlocks(html: String): IndexedSeq[Block] = {
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Block]
    val buf = new java.lang.StringBuilder
    var zoneDepth = 0
    var linkDepth = 0
    var nLinks = 0
    var linkChars = 0
    var totalChars = 0
    var skipTag: String = null
    val n = html.length
    // one lowercase pass up front: the skip-subtree scan searches for
    // case-insensitive close tags, and lowering per <script> would be
    // quadratic on script-heavy real pages
    lazy val lower = html.toLowerCase(java.util.Locale.ROOT)
    var i = 0

    def flush(): Unit = {
      val t = buf.toString.trim.replaceAll("\\s+", " ")
      if (t.nonEmpty) {
        blocks += Block(blocks.length, zoneDepth > 0, t,
          t.split(' ').length, nLinks, linkChars, totalChars)
      }
      buf.setLength(0)
      nLinks = 0
      linkChars = 0
      totalChars = 0
    }

    def readName(from: Int): (String, Int) = {
      var j = from
      while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
      (html.substring(from, j).toLowerCase(java.util.Locale.ROOT), j)
    }

    while (i < n) {
      if (skipTag != null) {
        // inside script/style/…: scan only for the matching close tag
        val close = "</" + skipTag
        val at = lower.indexOf(close, i)
        if (at < 0) { i = n; skipTag = null }
        else {
          val gt = html.indexOf('>', at)
          i = if (gt < 0) n else gt + 1
          skipTag = null
        }
      } else {
        val c = html.charAt(i)
        if (c == '<') {
          if (html.startsWith("<!--", i)) {
            val end = html.indexOf("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
            val gt = html.indexOf('>', i)
            i = if (gt < 0) n else gt + 1
          } else if (i + 1 < n && html.charAt(i + 1) == '/') {
            val (name, _) = readName(i + 2)
            val gt = html.indexOf('>', i)
            i = if (gt < 0) n else gt + 1
            if (name == "a") { if (linkDepth > 0) linkDepth -= 1 }
            else if (BlockTags.contains(name)) {
              flush()
              if (ZoneTags.contains(name) && zoneDepth > 0) zoneDepth -= 1
            }
          } else if (i + 1 < n && html.charAt(i + 1).isLetter) {
            val (name, afterName) = readName(i + 1)
            // scan attributes to the tag end, honoring quoted values
            // (a '>' inside href="…>…" is not the tag close)
            var j = afterName
            var quote: Char = 0
            var selfClosing = false
            var done = false
            while (j < n && !done) {
              val ch = html.charAt(j)
              if (quote != 0) { if (ch == quote) quote = 0 }
              else if (ch == '"' || ch == '\'') quote = ch
              else if (ch == '>') { selfClosing = j > 0 && html.charAt(j - 1) == '/'; done = true }
              j += 1
            }
            i = j
            if (SkipTags.contains(name)) { flush(); if (!selfClosing) skipTag = name }
            else if (BlockTags.contains(name)) {
              flush()
              if (ZoneTags.contains(name) && !selfClosing) zoneDepth += 1
            } else if (name == "a") {
              if (!selfClosing) { linkDepth += 1; nLinks += 1 }
            }
          } else {
            // stray '<' in text flow
            buf.append(c); totalChars += 1
            if (linkDepth > 0) linkChars += 1
            i += 1
          }
        } else if (c == '&') {
          val semi = html.indexOf(';', i + 1)
          val decoded =
            if (semi > i && semi - i <= 10) decodeEntity(html.substring(i + 1, semi))
            else None
          decoded match {
            case Some(s) =>
              buf.append(s)
              s.foreach { sc =>
                if (!sc.isWhitespace) {
                  totalChars += 1
                  if (linkDepth > 0) linkChars += 1
                }
              }
              i = semi + 1
            case None =>
              buf.append(c); totalChars += 1
              if (linkDepth > 0) linkChars += 1
              i += 1
          }
        } else {
          buf.append(c)
          if (!c.isWhitespace) {
            totalChars += 1
            if (linkDepth > 0) linkChars += 1
          }
          i += 1
        }
      }
    }
    flush()
    blocks.toIndexedSeq
  }

  /** Default content rules: ≥ 5 words (jusText's short-block floor) and
    * ≤ 1/3 of text characters inside links. */
  val DefaultMinWords = 5
  val DefaultMaxLinkDensity = 0.33

  def isContent(b: Block, minWords: Int = DefaultMinWords,
                maxLinkDensity: Double = DefaultMaxLinkDensity): Boolean =
    !b.zone && b.n_words >= minWords &&
      b.link_chars.toDouble <= maxLinkDensity * math.max(1, b.total_chars)

  final case class DocBlock(doc_id: Long, block_idx: Int, zone: Boolean,
                            text: String, n_words: Int, n_links: Int,
                            link_chars: Int, total_chars: Int,
                            content: Boolean)

  /** Per-block relation for analysis/tuning: one row per segmented
    * block with its signals and the content verdict. Partition-parallel
    * flatMap, no shuffle. */
  def blocks(df: DataFrame, idCol: String, htmlCol: String,
             minWords: Int = DefaultMinWords,
             maxLinkDensity: Double = DefaultMaxLinkDensity): Dataset[DocBlock] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, html) =>
          parseBlocks(if (html == null) "" else html).map(b =>
            DocBlock(id, b.block_idx, b.zone, b.text, b.n_words, b.n_links,
              b.link_chars, b.total_chars, isContent(b, minWords, maxLinkDensity)))
        }
      }
  }

  final case class Extracted(doc_id: Long, extracted_text: String,
                             n_blocks: Long, kept_blocks: Long,
                             dropped_chars: Long)

  /** One row per input document: content blocks joined in document
    * order, plus the segmentation/classification tallies a curation
    * audit wants. This is curation stage 0 — feed `extracted_text`
    * where the pipeline expects clean `text`. */
  def extract(df: DataFrame, idCol: String, htmlCol: String,
              minWords: Int = DefaultMinWords,
              maxLinkDensity: Double = DefaultMaxLinkDensity): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, html) =>
          val bs = parseBlocks(if (html == null) "" else html)
          val content = bs.filter(isContent(_, minWords, maxLinkDensity))
          Extracted(id, content.map(_.text).mkString(" "),
            bs.length.toLong, content.length.toLong,
            bs.filterNot(isContent(_, minWords, maxLinkDensity))
              .map(_.total_chars.toLong).sum)
        }
      }
      .toDF("doc_id", "extracted_text", "n_blocks", "kept_blocks", "dropped_chars")
      .withColumnRenamed("doc_id", idCol)
  }

  // ----------------------------------------------------------- fixtures

  private def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Words-per-paragraph of the fixture page; a trailing chunk shorter
    * than [[DefaultMinWords]] merges into the previous paragraph so
    * every emitted paragraph independently clears the word floor —
    * which is what keeps the extraction closed-form (all-or-nothing per
    * document, see [[testHtml]]). */
  val FixtureParaWords = 40

  /** Deterministic test page for (`docId`, `text`): real chrome (title,
    * header, nav list, script, link-dense aside, footer) around an
    * `<article>` holding `text` re-chunked into ≤ [[FixtureParaWords]]-
    * word paragraphs. Closed form an ANSI oracle can predict:
    *  - chrome never extracts (zones / skip subtrees / short title),
    *  - every paragraph extracts iff the document has ≥ 5 words
    *    (the tail-merge rule above), so
    *  - `extracted_text` = whitespace-normalized `text` when the doc
    *    has ≥ 5 words, else `''`;
    *  - `kept_blocks` = the paragraph count (`⌊w/40⌋` + 1 more iff
    *    `w mod 40 ≥ 5`, 0 iff `w < 5`);
    *  - `n_blocks` = kept + 7 chrome blocks (title, header h1, 3 nav
    *    items, aside, footer) + 1 iff `0 < w < 5` (the dropped para). */
  def testHtml(docId: Long, text: String): String = {
    val words = text.trim.split("\\s+").filter(_.nonEmpty).toIndexedSeq
    val chunks0 = words.grouped(FixtureParaWords).map(_.mkString(" ")).toIndexedSeq
    val chunks =
      if (chunks0.length >= 2 &&
          chunks0.last.split(' ').length < DefaultMinWords)
        chunks0.dropRight(2) :+ (chunks0(chunks0.length - 2) + " " + chunks0.last)
      else chunks0
    val paras = chunks.map(c => s"<p>${escapeHtml(c)}</p>").mkString("\n  ")
    s"""<html><head><title>Doc $docId</title><style>body { margin: 0; }</style></head>
       |<body>
       |<header><h1>Site $docId</h1></header>
       |<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li><li><a href="/contact">Contact</a></li></ul></nav>
       |<script>var docId = $docId; if (docId > 0) { track(docId); }</script>
       |<article>
       |  $paras
       |</article>
       |<aside><a href="/rel1">related article one</a> <a href="/rel2">related article two</a></aside>
       |<footer>Copyright 2026 Example Site <a href="/tos">Terms of Service</a> All rights reserved</footer>
       |</body></html>""".stripMargin
  }

  /** (doc_id, html) table of [[testHtml]] pages over the documents
    * relation — the ingest half of the extraction round-trip, encoded
    * partition-parallel like the media tables. */
  def htmlTable(documents: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(it => it.map { case (id, t) => (id, testHtml(id, t)) })
      .toDF(idCol, "html")
  }
}
