package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** sitemap.xml (sitemaps.org XML format) — the crawl-SCHEDULING input: a
  * site publishes `<url><loc>…</loc><lastmod>…</lastmod></url>` entries,
  * and the crawler compares `lastmod` against its last-crawl snapshot to
  * decide what to re-fetch. The companion of [[Warc]] (what arrived) and
  * `UrlOps.parseRobots` (what may be fetched): this is what SHOULD be
  * fetched next.
  *
  * Parsing is XML-lite by design: sitemap files are machine-generated
  * with a fixed tag set (the sitemaps.org schema has no attributes on
  * `<url>/<loc>/<lastmod>` and forbids nested `<url>` blocks), so
  * block + tag extraction with non-greedy regex Columns is exact for
  * conforming files — and it keeps the parse a zero-shuffle narrow map,
  * one row per sitemap in, one row per entry out. A full XML parser
  * would buy namespace handling the format never uses.
  *
  * `lastmod` crosses the engine boundary as an EPOCH-DAY integer
  * (`datediff` from 1970-01-01): the repo's timestamp rule — raw dates
  * hash differently per reader. Entries without `<lastmod>` (it is
  * optional in the spec) carry −1.
  */
object Sitemap {

  /** One row per `<url>` entry: `(domain, loc, lastmod_day)`.
    * Entries missing the REQUIRED `<loc>` are dropped; missing
    * OPTIONAL `<lastmod>` yields −1. */
  def parseSitemap(sitemaps: DataFrame, domainCol: String = "domain",
                   xmlCol: String = "sitemap_xml"): DataFrame = {
    val blocks = regexp_extract_all(col(xmlCol),
      lit("(?s)<url>(.*?)</url>"), lit(1))
    val lastmod = trim(regexp_extract(col("b"),
      "(?s)<lastmod>([^<]*)</lastmod>", 1))
    sitemaps
      .select(col(domainCol).as("domain"), explode(blocks).as("b"))
      .select(col("domain"),
        trim(regexp_extract(col("b"), "(?s)<loc>([^<]*)</loc>", 1)).as("loc"),
        when(length(lastmod) > 0,
          datediff(to_date(lastmod), to_date(lit("1970-01-01"))).cast("long"))
          .otherwise(lit(-1L)).as("lastmod_day"))
      .where(length(col("loc")) > 0)
  }

  /** One row per `<sitemap>` member of a `<sitemapindex>` (sitemaps.org:
    * the 50k-URL / 50 MB cap per file forces every large site to front
    * an index of child sitemaps, usually `.xml.gz`): `(domain,
    * child_loc, child_lastmod_day)`. Same XML-lite contract as
    * [[parseSitemap]] — the index schema has no attributes and forbids
    * nesting, so block + tag regex Columns are exact for conforming
    * files; one zero-shuffle narrow map. Members missing the REQUIRED
    * `<loc>` are dropped; missing OPTIONAL `<lastmod>` yields −1. */
  def parseSitemapIndex(indexes: DataFrame, domainCol: String = "domain",
                        xmlCol: String = "index_xml"): DataFrame = {
    val blocks = regexp_extract_all(col(xmlCol),
      lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1))
    val lastmod = trim(regexp_extract(col("b"),
      "(?s)<lastmod>([^<]*)</lastmod>", 1))
    indexes
      .select(col(domainCol).as("domain"), explode(blocks).as("b"))
      .select(col("domain"),
        trim(regexp_extract(col("b"), "(?s)<loc>([^<]*)</loc>", 1))
          .as("child_loc"),
        when(length(lastmod) > 0,
          datediff(to_date(lastmod), to_date(lit("1970-01-01"))).cast("long"))
          .otherwise(lit(-1L)).as("child_lastmod_day"))
      .where(length(col("child_loc")) > 0)
  }

  /** Inflate fetched sitemap blobs into XML text: `.xml.gz` members
    * (gzip magic sniffed, ALL members inflated and concatenated —
    * [[graft.sources.Warc.gzipMembers]] verifies each CRC32/ISIZE) or
    * plain XML passed through as UTF-8. The read-side companion of
    * [[parseSitemapIndex]]: a crawler fetches the child locs the index
    * names, and real large sites serve them gzipped. Per-row inflate
    * inside `mapPartitions` — no shuffle, embarrassingly parallel; the
    * expected schema is `(domain, loc, blob: binary)` out to
    * `(domain, loc, xml)`. */
  def gunzipSitemaps(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("domain"), col("loc"), col("blob"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (domain, loc, blob) =>
          val xml =
            if (blob.length >= 2 && blob(0) == 0x1f &&
                blob(1) == 0x8b.toByte)
              Warc.gzipMembers(blob).map(m =>
                new String(m._2, java.nio.charset.StandardCharsets.UTF_8))
                .mkString
            else new String(blob, java.nio.charset.StandardCharsets.UTF_8)
          (domain, loc, xml)
        }
      }
      .toDF("domain", "loc", "sitemap_xml")
  }

  /** The re-crawl decision: given parsed sitemap entries and a crawl
    * snapshot `(domain, loc, crawled_day)`, a URL needs re-fetching iff
    * its `lastmod` is unknown (−1 — the spec makes it optional, and a
    * polite crawler re-checks unknowns) or strictly newer than the last
    * crawl. One broadcast-able equi-join on `(domain, loc)` — the
    * sitemap side is site-count-sized, tiny next to the crawl. Emits
    * the snapshot plus `(lastmod_day, recrawl)`. */
  def recrawlCandidates(snapshot: DataFrame, entries: DataFrame): DataFrame =
    snapshot.join(broadcast(entries), Seq("domain", "loc"), "left")
      .withColumn("lastmod_day", coalesce(col("lastmod_day"), lit(-1L)))
      .withColumn("recrawl",
        (col("lastmod_day") === -1L ||
          col("lastmod_day") > col("crawled_day")).cast("long"))
}
