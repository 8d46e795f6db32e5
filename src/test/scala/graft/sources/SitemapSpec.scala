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
  private val indexXml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <sitemap>
      |    <loc>https://ex.com/sitemap-0.xml.gz</loc>
      |    <lastmod>2022-04-18</lastmod>
      |  </sitemap>
      |  <sitemap><loc> https://ex.com/sitemap-1.xml.gz </loc></sitemap>
      |  <sitemap><lastmod>2022-01-01</lastmod></sitemap>
      |</sitemapindex>""".stripMargin

  "parseSitemapIndex" should "extract child sitemaps with optional lastmod, drop loc-less" in {
    val s = spark
    import s.implicits._
    val got = Sitemap.parseSitemapIndex(Seq(("ex.com", indexXml))
        .toDF("domain", "index_xml"))
      .orderBy("child_loc").as[(String, String, Long)].collect().toSeq
    // 2022-04-18 = 19100 days from epoch
    got shouldBe Seq(
      ("ex.com", "https://ex.com/sitemap-0.xml.gz", 19100L),
      ("ex.com", "https://ex.com/sitemap-1.xml.gz", -1L))
  }

  "gunzipSitemaps" should "sniff gzip magic, inflate members, pass plain XML through" in {
    val s = spark
    import s.implicits._
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    // two members in one blob (the concatenated-gzip form real CDNs
    // emit) must inflate and concatenate in order
    val twoMembers = Warc.gzipMember("<urlset>part1".getBytes(utf8)) ++
      Warc.gzipMember(" part2</urlset>".getBytes(utf8))
    val blobs = Seq(
      ("ex.com", "https://ex.com/s0.xml.gz",
        Warc.gzipMember(xml.getBytes(utf8))),
      ("ex.com", "https://ex.com/s1.xml", xml.getBytes(utf8)),
      ("ex.com", "https://ex.com/s2.xml.gz", twoMembers))
      .toDF("domain", "loc", "blob")
    val got = Sitemap.gunzipSitemaps(blobs).orderBy("loc")
      .as[(String, String, String)].collect().toSeq
    got shouldBe Seq(
      ("ex.com", "https://ex.com/s0.xml.gz", xml),
      ("ex.com", "https://ex.com/s1.xml", xml),
      ("ex.com", "https://ex.com/s2.xml.gz", "<urlset>part1 part2</urlset>"))
  }

  it should "feed parseSitemap the same entries through the gz hop (index walk end-to-end)" in {
    val s = spark
    import s.implicits._
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val children = Sitemap.parseSitemapIndex(Seq(("ex.com", indexXml))
        .toDF("domain", "index_xml"))
      .select("domain", "child_loc").as[(String, String)].collect().toSeq
    val blobs = children.map { case (d, loc) =>
      (d, loc, Warc.gzipMember(xml.getBytes(utf8)))
    }.toDF("domain", "loc", "blob")
    val entries = Sitemap.parseSitemap(Sitemap.gunzipSitemaps(blobs))
      .orderBy("loc").select("loc").as[String].collect().toSeq
    // both children carried the same urlset → each entry appears twice
    entries shouldBe Seq("http://ex.com/a", "http://ex.com/a",
      "http://ex.com/b", "http://ex.com/b",
      "http://ex.com/c", "http://ex.com/c")
  }
}
