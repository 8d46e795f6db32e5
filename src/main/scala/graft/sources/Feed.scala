package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RSS 2.0 / Atom (RFC 4287) feed parsing — the third crawl-discovery
  * channel next to [[Sitemap]] and `UrlOps.sitemapDirectives`: news and
  * blog hosts publish their freshest URLs in a feed long before a
  * sitemap regenerates, so a recency-sensitive corpus crawl polls feeds
  * first. Emits one row per item/entry with the fields a frontier
  * scheduler needs: link, title, and the publish day.
  *
  * Same XML-lite contract as [[Sitemap]]: both formats are
  * machine-generated with fixed structure, so block + tag extraction
  * with non-greedy regex Columns is exact for conforming feeds and the
  * parse stays a zero-shuffle narrow map. Format is auto-detected per
  * document from the root element (`<feed` = Atom, else RSS).
  *
  * Format differences handled here:
  *   - RSS items are `<item>` blocks; the link is ELEMENT TEXT
  *     (`<link>url</link>`), the date field is `<pubDate>`;
  *   - Atom entries are `<entry>` blocks; the link is an ATTRIBUTE
  *     (`<link href="url"/>` — the alternate link per RFC 4287 §4.2.7),
  *     the date field is `<updated>`;
  *   - titles may carry a CDATA wrapper in real feeds — stripped.
  *
  * Dates cross the engine boundary as EPOCH-DAY integers (the repo's
  * timestamp rule); feeds whose date field is missing or unparseable
  * carry −1. The fixture-facing contract accepts ISO `yyyy-MM-dd`
  * prefixes (RFC 822 dates, RSS's legacy spelling, are a transcoding
  * concern the ingest edge handles once, not per-operator).
  */
object Feed {

  private def cdataStrip(c: Column): Column =
    regexp_replace(c, "(?s)^\\s*<!\\[CDATA\\[(.*)\\]\\]>\\s*$", "$1")

  private def dayOf(raw: Column): Column =
    when(raw.rlike("^\\d{4}-\\d{2}-\\d{2}"),
      datediff(to_date(substring(raw, 1, 10)), to_date(lit("1970-01-01")))
        .cast("long"))
      .otherwise(lit(-1L))

  /** One row per item/entry: `(domain, fmt, idx, title, link, pub_day)`
    * — `fmt` is `rss` or `atom`, `idx` the in-feed position (feeds are
    * freshest-first, so position IS the recency rank a frontier uses).
    * Items missing a link are dropped (nothing to fetch); missing
    * titles yield empty strings, missing/unparseable dates −1. */
  def parseFeed(feeds: DataFrame, domainCol: String = "domain",
                xmlCol: String = "feed_xml"): DataFrame = {
    val xml = col(xmlCol)
    // detect from the ROOT element (prologue/comment-tolerant anchor),
    // not from any "<feed" occurrence — an RSS item whose content merely
    // contains that string must still parse as RSS
    val isAtom = xml.rlike(
      "(?s)^\\s*(<\\?xml[^>]*>\\s*)?(<!--.*?-->\\s*)*<feed[\\s>]")
    val blocks = when(isAtom,
      regexp_extract_all(xml, lit("(?s)<entry[^>]*>(.*?)</entry>"), lit(1)))
      .otherwise(
        regexp_extract_all(xml, lit("(?s)<item[^>]*>(.*?)</item>"), lit(1)))
    val title = trim(cdataStrip(
      regexp_extract(col("b"), "(?s)<title[^>]*>(.*?)</title>", 1)))
    val link = when(col("fmt") === "atom",
      regexp_extract(col("b"),
        "(?is)<link\\b[^>]*[\\s\"']href\\s*=\\s*[\"']?([^\\s\"'>]+)", 1))
      .otherwise(trim(regexp_extract(col("b"),
        "(?s)<link>([^<]*)</link>", 1)))
    val date = trim(regexp_extract(col("b"),
      "(?s)<(?:pubDate|updated)>([^<]*)</(?:pubDate|updated)>", 1))
    feeds
      .select(col(domainCol).as("domain"),
        when(isAtom, lit("atom")).otherwise(lit("rss")).as("fmt"),
        posexplode(blocks).as(Seq("idx", "b")))
      .select(col("domain"), col("fmt"), col("idx"), title.as("title"),
        link.as("link"), dayOf(date).as("pub_day"))
      .where(length(col("link")) > 0)
  }
}
