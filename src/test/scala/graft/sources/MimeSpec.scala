package graft.sources

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.tsne.SparkTestBase

/** MIME parsing pinned on hand-built and builder messages: byte-level
  * quoted-printable decode (multibyte escapes, soft breaks, malformed
  * passthrough), base64 parts, multipart split, framing tolerance. */
class MimeSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def qp(ss: String*): Seq[String] = {
    val s = spark
    import s.implicits._
    ss.toDF("c").select(Mime.qpDecode(col("c"))).as[String].collect().toSeq
  }

  "qpDecode" should "reassemble multibyte escapes at the BYTE level" in {
    // =E2=82=AC is the three UTF-8 bytes of the euro sign — a
    // code-point-wise decode would give 'â‚¬'
    qp("Total =E2=82=AC42 =3D net", "=C3=BCber", "plain") shouldBe
      Seq("Total €42 = net", "über", "plain")
  }

  it should "remove soft line breaks and keep hard ones" in {
    qp("split ac=\r\nross lines", "a=0D=0Ab") shouldBe
      Seq("split across lines", "a\r\nb")
  }

  it should "pass malformed escapes through literally" in {
    qp("bad =ZZ escape", "trailing =", "=4") shouldBe
      Seq("bad =ZZ escape", "trailing =", "=4")
  }

  it should "round-trip qpEncode output including forced soft breaks" in {
    val texts = Seq("a longer text that certainly exceeds the forty " +
      "character soft limit — twice over, with ümlauts €", "x")
    val enc = texts.map(t => Mime.qpEncode(t))
    enc.head should include("=\r\n") // soft break actually present
    qp(enc: _*) shouldBe texts
  }

  "mimeParts" should "split multipart/alternative and decode each part" in {
    val s = spark
    import s.implicits._
    val eml = Mime.buildEml("a@ex.com", "Hello 7", "bnd42",
      "Invoice € 42.50 = total", "<p>Invoice — detail</p>")
    val got = Mime.mimeParts(Seq((1L, eml)).toDF("id", "payload"))
      .select("id", "part", "part_type", "cte", "text", "from_addr",
        "subject")
      .as[(Long, Int, String, String, String, String, String)]
      .collect().sortBy(_._2).toSeq
    got shouldBe Seq(
      (1L, 0, "text/plain", "quoted-printable", "Invoice € 42.50 = total",
        "a@ex.com", "Hello 7"),
      (1L, 1, "text/html", "base64", "<p>Invoice — detail</p>",
        "a@ex.com", "Hello 7"))
  }

  it should "treat a non-multipart message as one identity part" in {
    val s = spark
    import s.implicits._
    val eml = "From: x@ex.com\r\nSubject: plain\r\n" +
      "Content-Type: text/plain\r\n\r\njust a body"
    val got = Mime.mimeParts(Seq((9L, eml)).toDF("id", "payload"))
      .select("id", "part", "cte", "text", "subject")
      .as[(Long, Int, String, String, String)].collect().toSeq
    got shouldBe Seq((9L, 0, "", "just a body", "plain"))
  }

  it should "parse a bare-LF mailbox dump (lenient framing)" in {
    val s = spark
    import s.implicits._
    val eml = "From: y@ex.com\nSubject: lf\n\nlf body"
    val got = Mime.mimeParts(Seq((2L, eml)).toDF("id", "payload"))
      .select("part", "text", "from_addr")
      .as[(Int, String, String)].collect().toSeq
    got shouldBe Seq((0, "lf body", "y@ex.com"))
  }

  it should "quote regex metacharacters in the boundary" in {
    val s = spark
    import s.implicits._
    // RFC 2046 allows these in a boundary; an unquoted split would
    // treat them as a character class
    val eml = Mime.buildEml("z@ex.com", "meta", "a+b(c]",
      "part one", "<i>two</i>")
    Mime.mimeParts(Seq((3L, eml)).toDF("id", "payload"))
      .select("text").as[String].collect().toSeq
      .sorted shouldBe Seq("<i>two</i>", "part one")
  }
}
