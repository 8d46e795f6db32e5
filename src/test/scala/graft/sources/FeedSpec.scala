package graft.sources

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** Feed parsing pinned on hand-built RSS and Atom documents: format
  * auto-detection, element-text vs href-attribute links, CDATA titles,
  * date handling, and the drop rules. */
class FeedSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def parse(xml: String): Seq[(String, Int, String, String, Long)] = {
    val s = spark
    import s.implicits._
    Feed.parseFeed(Seq(("d1", xml)).toDF("domain", "feed_xml"))
      .select("fmt", "idx", "title", "link", "pub_day")
      .as[(String, Int, String, String, Long)].collect().toSeq
  }

  "parseFeed" should "parse RSS items in order with element-text links" in {
    parse("""<?xml version="1.0"?><rss version="2.0"><channel>
      |<title>Chan</title><link>http://ex.com/</link>
      |<item><title>First post</title><link>http://ex.com/1</link>
      |<pubDate>2026-03-05</pubDate></item>
      |<item><title><![CDATA[Second <b>post</b>]]></title>
      |<link>http://ex.com/2</link></item>
      |</channel></rss>""".stripMargin) shouldBe Seq(
      ("rss", 0, "First post", "http://ex.com/1", 20517L),
      ("rss", 1, "Second <b>post</b>", "http://ex.com/2", -1L))
  }

  it should "parse Atom entries with href links and <updated> dates" in {
    parse("""<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">
      |<title>F</title><link href="http://ex.com/"/>
      |<entry><title>A</title><link href="http://ex.com/a"/>
      |<updated>2026-03-06T10:00:00Z</updated></entry>
      |<entry><title>B</title><link rel="alternate" href='http://ex.com/b'/>
      |</entry></feed>""".stripMargin) shouldBe Seq(
      ("atom", 0, "A", "http://ex.com/a", 20518L),
      ("atom", 1, "B", "http://ex.com/b", -1L))
  }

  it should "drop items without a link, keep empty titles" in {
    parse("<rss><channel><item><title>no link</title></item>" +
      "<item><link>http://ex.com/x</link></item>" +
      "</channel></rss>") shouldBe Seq(
      ("rss", 1, "", "http://ex.com/x", -1L))
  }

  it should "detect format from the ROOT element, not content mentions" in {
    // an RSS item that merely CONTAINS the string "<feed" (a CDATA
    // title quoting Atom markup) must still parse as RSS — an
    // anywhere-in-document probe would flip it to Atom and emit nothing
    parse("""<?xml version="1.0"?><!-- generator --><rss version="2.0">
      |<channel><item><title><![CDATA[How <feed> works]]></title>
      |<link>http://ex.com/atom-guide</link></item>
      |</channel></rss>""".stripMargin) shouldBe Seq(
      ("rss", 0, "How <feed> works", "http://ex.com/atom-guide", -1L))
    // and a prologue+comment-prefixed Atom root still reads as Atom
    parse("""<?xml version="1.0"?>
      |<!-- mirror --> <feed><entry><title>A</title>
      |<link href="http://ex.com/a"/></entry></feed>""".stripMargin)
      .map(_._1) shouldBe Seq("atom")
  }

  it should "not parse an RSS <link> channel element as an item" in {
    parse("<rss><channel><link>http://ex.com/</link>" +
      "</channel></rss>") shouldBe Seq.empty
  }
}
