package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for scrape-feed dedup — the news-ingest twin
  * of [[Cleanse]] (ref newsflow_scraper.py tracks articles by their
  * feed link, where the same story arrives as `HTTPS://WWW.X.COM:443`,
  * `https://x.com/...?utm_source=rss`, and `https://x.com/...#frag`
  * variants). One canonical form collapses them:
  *
  *   - scheme and host lowercase; default port (:443 https / :80
  *     http) and a leading `www.` stripped from the host,
  *   - fragment dropped,
  *   - trailing slashes dropped from the path (case preserved —
  *     paths are case-sensitive),
  *   - query params split, tracking params (`utm_*`, `ref`, `fbclid`,
  *     `gclid`) and empties dropped, the rest SORTED and rejoined.
  *
  * Everything is regexp/array built-ins over one string column — no
  * UDF, narrow map, mirrored token-for-token by [[canonicalUrlSql]]
  * (regexes stay in the Java∩RE2 common dialect: character classes
  * and alternation only, no lookaround). */
object UrlCanon {

  private val trackRe = "^(utm_[^=]*|ref|fbclid|gclid)="

  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme = lower(regexp_extract(noFrag,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    val noPort = when(scheme === "https",
        regexp_replace(hostport, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .otherwise(hostport)
    val host = regexp_replace(noPort, "^www\\.", "")
    val path = regexp_replace(regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)", 1), "/+$", "")
    val params = filter(split(regexp_extract(noFrag, "\\?(.*)$", 1),
      "&"), p => p =!= "" && !p.rlike(trackRe))
    val qs = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(qs =!= "", concat(lit("?"), qs)).otherwise(lit("")))
  }

  /** The regex the oracle's `list_filter` mirrors ([[canonicalUrl]]'s
    * tracking-param drop) — exposed so the q217 SQL interpolates the
    * SAME pattern rather than a copy that can drift. */
  def trackParamRe: String = trackRe

  /** Deterministic synthetic feed URL per doc — the by-construction
    * harness for the canonicalization gate (the q193 pattern, strings
    * instead of pixels): consecutive doc triples (n = doc/3) are the
    * SAME logical article served as three rotating link variants
    * (upper-cased www+port form, a trailing-slash + fragment + utm
    * form, and a ref-tracking form), on a host derived from n so the
    * triple really collapses: all three must canonicalize to
    * `https://src<n%20>.com/News/Item-<n>?id=<n>`. */
  def synthUrl(doc: Column): Column = {
    val n = call_function("div", doc, lit(3L)).cast("string")
    val host = concat(lit("src"),
      (call_function("div", doc, lit(3L)) % 20).cast("string"))
    val v = doc % 3
    when(v === 0, concat(lit("HTTPS://WWW."), upper(host),
        lit(".COM:443/News/Item-"), n, lit("?utm_source=rss&id="), n))
      .when(v === 1, concat(lit("https://"), host,
        lit(".com/News/Item-"), n, lit("/?id="), n,
        lit("&utm_medium=email#frag")))
      .otherwise(concat(lit("https://www."), host,
        lit(".com/News/Item-"), n, lit("?id="), n, lit("&ref=home")))
  }

  /** The DuckDB mirror of [[synthUrl]]. Emitted as ONE line: this
    * fragment interpolates into oracle strings that apply their own
    * `.stripMargin`, which would eat a `||` concatenation opening a
    * continuation line. */
  def synthUrlSql(doc: String): String = {
    val host = s"('src' || ((($doc) // 3) % 20))"
    s"(CASE (($doc) % 3) " +
      s"WHEN 0 THEN 'HTTPS://WWW.' || upper($host) || " +
      s"'.COM:443/News/Item-' || (($doc) // 3) || " +
      s"'?utm_source=rss&id=' || (($doc) // 3) " +
      s"WHEN 1 THEN 'https://' || $host || '.com/News/Item-' || " +
      s"(($doc) // 3) || '/?id=' || (($doc) // 3) || " +
      s"'&utm_medium=email#frag' " +
      s"ELSE 'https://www.' || $host || '.com/News/Item-' || " +
      s"(($doc) // 3) || '?id=' || (($doc) // 3) || '&ref=home' END)"
  }
}
