package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.tsne.SparkTestBase

/** Encoding sniff ladder pinned byte-for-byte: BOM beats header beats
  * meta beats default, both meta declaration forms, alias folding, and
  * the prescan window bound. */
class CharsetSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def sniff(rows: (Array[Byte], String)*): Seq[(String, String)] = {
    val s = spark
    import s.implicits._
    rows.toDF("payload", "ct")
      .select(Charset.sniff(col("payload"), col("ct")).as("r"))
      .select("r.encoding", "r.via")
      .as[(String, String)].collect().toSeq
  }

  private def b(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  "sniff" should "let a BOM beat header and meta" in {
    sniff(
      (Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
        b("<meta charset=koi8-r>"), "text/html; charset=iso-8859-1"),
      (Array[Byte](0xFE.toByte, 0xFF.toByte) ++ b("x"), ""),
      (Array[Byte](0xFF.toByte, 0xFE.toByte) ++ b("x"), "")) shouldBe Seq(
      ("utf-8", "bom"), ("utf-16be", "bom"), ("utf-16le", "bom"))
  }

  it should "prefer the transport header over the meta prescan" in {
    sniff((b("<html><meta charset='koi8-r'></html>"),
      "text/html; charset=UTF8")) shouldBe Seq(("utf-8", "header"))
  }

  it should "read both meta forms when nothing else decides" in {
    sniff(
      (b("<html><head><meta charset=\"Shift_JIS\"></head>"), "text/html"),
      (b("<meta http-equiv=\"Content-Type\" " +
        "content=\"text/html; charset=windows-1251\">"), null)) shouldBe Seq(
      ("shift_jis", "meta"), ("windows-1251", "meta"))
  }

  it should "skip a meta that mentions charset without declaring one" in {
    // the decoy PRECEDES the real declaration: a first-element-only
    // prescan would select the decoy, extract nothing, and fall through
    // to the default — the ladder must consult every candidate
    sniff((b("<meta name=keywords content=\"charset tips and tricks\">" +
      "<meta charset=koi8-r>"), "text/html")) shouldBe
      Seq(("koi8-r", "meta"))
  }

  it should "fold aliases and default to utf-8" in {
    sniff(
      (b("x"), "text/html; charset=Latin-1"),
      (b("<meta charset=ASCII>"), ""),
      (b("<html>no declaration</html>"), "text/plain")) shouldBe Seq(
      ("iso-8859-1", "header"), ("us-ascii", "meta"), ("utf-8", "default"))
  }

  it should "not see a meta declaration beyond the prescan window" in {
    val s = spark
    import s.implicits._
    val far = b(" " * 2000 + "<meta charset=koi8-r>")
    Seq((far, "")).toDF("payload", "ct")
      .select(Charset.sniff(col("payload"), col("ct")).as("r"))
      .select("r.encoding", "r.via").as[(String, String)]
      .collect().head shouldBe (("utf-8", "default"))
  }

  it should "not read FEFF mid-payload or a bare FF as a BOM" in {
    sniff(
      (b("ab") ++ Array[Byte](0xFE.toByte, 0xFF.toByte), ""),
      (Array[Byte](0xFF.toByte), "")) shouldBe Seq(
      ("utf-8", "default"), ("utf-8", "default"))
  }
}
