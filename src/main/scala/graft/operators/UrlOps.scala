package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and domain-grain curation — the provenance limb
  * of a web pipeline: crawl URLs arrive with case noise, tracking
  * parameters, fragments, and default ports, and everything downstream
  * (per-domain caps, blocklists, dedup-by-URL) needs ONE canonical form
  * per resource.
  *
  * [[canonicalize]] is a fixed, deterministic rule chain composed
  * entirely of codegen'd built-ins (lower/regexp_replace/concat — no
  * UDF, no custom expression needed; the whole chain stays inside
  * whole-stage codegen):
  *   1. trim; strip the fragment (`#…` — client-side only, never part
  *      of the resource identity);
  *   2. lowercase the scheme+authority (host names are case-
  *      insensitive; paths are NOT — path case is preserved);
  *   3. strip default ports (`:80` for http, `:443` for https —
  *      non-default ports are identity-bearing and kept);
  *   4. strip tracking parameters (`utm_*`, `gclid`, `fbclid`,
  *      `msclkid` — the parameters that vary per click, not per
  *      resource), healing the separators: `&`-prefixed occurrences
  *      drop first, then a `?`-prefixed one followed by a real
  *      parameter promotes it, then a sole `?tracking` tail drops.
  * Unparseable strings pass through unchanged (total, like every
  * ingest-grain operator here).
  *
  * [[domain]] extracts the registrable host (authority minus
  * userinfo/port, minus a leading `www.`) — the grouping key for
  * per-domain quotas ([[QuotaSample.tokenQuota]] with domain as the
  * group) and blocklist anti-joins (broadcast: blocklists are KBs).
  */
object UrlOps {

  private val Tracking = "(utm_[^&#]*|gclid=[^&#]*|fbclid=[^&#]*|msclkid=[^&#]*)"

  def canonicalize(url: Column): Column = {
    val t = trim(url)
    // fragment off first: '#' ends the URL proper
    val noFrag = regexp_replace(t, "#.*$", "")
    // lowercase ONLY scheme://authority; path/query case-significant
    val auth = "^([^:/?#]+://[^/?#]*)"
    val lowered = concat(
      lower(regexp_extract(noFrag, auth, 1)),
      regexp_replace(noFrag, auth, ""))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/:?#]+):80([/?#].*)?$", "$1$2"),
      "^(https://[^/:?#]+):443([/?#].*)?$", "$1$2")
    // tracking params: &-prefixed → drop; ?-prefixed with a successor →
    // promote the successor; sole ?-prefixed tail → drop
    val s1 = regexp_replace(noPort, "&" + Tracking, "")
    val s2 = regexp_replace(s1, "\\?" + Tracking + "&", "?")
    regexp_replace(s2, "\\?" + Tracking + "$", "")
  }

  /** Registrable host of a canonical URL: authority minus userinfo and
    * port, minus one leading `www.`. Empty string when no authority. */
  def domain(canonUrl: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_extract(canonUrl, "^[^:/?#]+://([^/?#]+)", 1),
        "^[^@]*@", ""),
      "^www\\.|:[0-9]+$", "")

  /** Blocklist anti-join: drop rows whose domain is blocked. The
    * blocklist side broadcasts (curation blocklists are KBs — forcing
    * the hint keeps a 100 TB left side shuffle-free). */
  def dropBlockedDomains(df: DataFrame, domainCol: String,
                         blocklist: DataFrame): DataFrame =
    df.join(broadcast(blocklist.select(col("domain").as(domainCol))),
      Seq(domainCol), "left_anti")

  // ----------------------------------------------------------- fixtures

  /** Case-mangle a host deterministically (char i uppercased when
    * (i + id) % 3 == 0) — what crawl URLs actually look like. */
  private def mangle(s: String, id: Long): String =
    s.zipWithIndex.map { case (c, i) =>
      if ((i + id) % 3 == 0) c.toUpper else c
    }.mkString

  /** Deterministic messy-URL fixture: every component class by id
    * arithmetic, so the canonical form — and therefore the whole q145
    * pipeline — is closed-form for an ANSI oracle:
    *  - scheme http (even id) / https (odd), case-mangled;
    *  - host `www.host{id%7}.example.com`, case-mangled;
    *  - port: `:8080` kept iff id%11==0; else the scheme's DEFAULT port
    *    appended iff id%3==0 (canonically stripped);
    *  - path `/Articles/Item{id}` (case preserved);
    *  - query: id%9==0 → tracking-only (canonically empty); even →
    *    tracking-wrapped `id={id}`; odd → clean `page=2`; plus a
    *    `gclid` suffix iff id%5==0 (always stripped);
    *  - fragment `#Top` iff id%4==0 (always stripped). */
  def testUrl(id: Long): String = {
    val scheme = mangle(if (id % 2 == 0) "http" else "https", id)
    val host = mangle(s"www.host${id % 7}.example.com", id)
    val port =
      if (id % 11 == 0) ":8080"
      else if (id % 3 == 0) { if (id % 2 == 0) ":80" else ":443" }
      else ""
    val query0 =
      if (id % 9 == 0) "?utm_medium=rss"
      else if (id % 2 == 0) s"?utm_source=feed&id=$id&utm_campaign=x"
      else "?page=2"
    val query = if (id % 5 == 0) query0 + "&gclid=abc123" else query0
    val frag = if (id % 4 == 0) "#Top" else ""
    s"$scheme://$host$port/Articles/Item$id$query$frag"
  }

  /** (doc_id, url) table of [[testUrl]] fixtures. */
  def urlTable(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => (id, testUrl(id))))
      .toDF("doc_id", "url")
  }
}
