package graft.sources

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** sitemap.xml parse + re-crawl decision: entry extraction with optional
  * lastmod, required loc, whitespace tolerance, and the
  * unknown-or-newer recrawl rule. */
class SitemapSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private val xml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc>http://ex.com/a</loc>
      |    <lastmod>2022-03-15</lastmod>
      |  </url>
      |  <url><loc> http://ex.com/b </loc></url>
      |  <url><lastmod>2022-01-01</lastmod></url>
      |  <url>
      |    <lastmod>1970-01-03</lastmod>
      |    <loc>http://ex.com/c</loc>
      |  </url>
      |</urlset>""".stripMargin

  "parseSitemap" should "extract entries, trim whitespace, drop loc-less, default lastmod to -1" in {
    val s = spark
    import s.implicits._
    val got = Sitemap.parseSitemap(Seq(("ex.com", xml))
        .toDF("domain", "sitemap_xml"))
      .orderBy("loc").as[(String, String, Long)].collect().toSeq
    // 2022-03-15 = 19066 days from epoch; 1970-01-03 = 2
    got shouldBe Seq(
      ("ex.com", "http://ex.com/a", 19066L),
      ("ex.com", "http://ex.com/b", -1L),
      ("ex.com", "http://ex.com/c", 2L))
  }

  "recrawlCandidates" should "recrawl on unknown or strictly newer lastmod" in {
    val s = spark
    import s.implicits._
    val entries = Sitemap.parseSitemap(Seq(("ex.com", xml))
      .toDF("domain", "sitemap_xml"))
    val snapshot = Seq(
      ("ex.com", "http://ex.com/a", 19000L), // lastmod 19066 > 19000 → stale
      ("ex.com", "http://ex.com/a", 19066L), // equal → fresh
      ("ex.com", "http://ex.com/b", 19000L), // unknown lastmod → recrawl
      ("ex.com", "http://ex.com/c", 19000L), // lastmod 2 < crawl → fresh
      ("ex.com", "http://ex.com/zz", 19000L)) // not in sitemap → unknown
      .toDF("domain", "loc", "crawled_day")
    val got = Sitemap.recrawlCandidates(snapshot, entries)
      .orderBy("loc", "crawled_day")
      .select("loc", "crawled_day", "lastmod_day", "recrawl")
      .as[(String, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(
      ("http://ex.com/a", 19000L, 19066L, 1L),
      ("http://ex.com/a", 19066L, 19066L, 0L),
      ("http://ex.com/b", 19000L, -1L, 1L),
      ("http://ex.com/c", 19000L, 2L, 0L),
      ("http://ex.com/zz", 19000L, -1L, 1L))
  }
}
