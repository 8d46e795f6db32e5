package graft.sources

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.tsne.SparkTestBase

/** CSV dialect sniffing: each delimiter class, quoted-delimiter
  * masking, ragged-count rejection, header numericness flip, and the
  * no-evidence single-column case. */
class CsvSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def sniff(payloads: String*): Seq[(String, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    payloads.toDF("p").select(Csv.sniff(col("p")).as("s"))
      .select("s.delimiter", "s.has_header", "s.n_cols", "s.n_rows")
      .as[(String, Long, Long, Long)].collect().toSeq
  }

  "sniff" should "pick each planted delimiter" in {
    sniff("a,b,c\n1,2,3", "a;b;c\n1;2;3", "a\tb\tc\n1\t2\t3",
      "a|b|c\n1|2|3") shouldBe Seq(
      (",", 1L, 3L, 2L), (";", 1L, 3L, 2L), ("\t", 1L, 3L, 2L),
      ("|", 1L, 3L, 2L))
  }

  it should "not be fooled by delimiters inside quoted fields" in {
    // every line has exactly one ';' but a VARIABLE number of quoted
    // commas — masked counts make ';' the only consistent candidate
    sniff("x;\"a,b,c\"\ny;\"d,e\"\nz;\"f\"") shouldBe
      Seq((";", 0L, 2L, 3L))
  }

  it should "reject candidates with ragged per-line counts" in {
    // commas appear on every line but raggedly (prose); tabs are
    // consistent structure
    sniff("one, two\tcol\nthree, four, five\tcol\nsix\tcol") shouldBe
      Seq(("\t", 0L, 2L, 3L))
  }

  it should "detect a header only on the numericness flip" in {
    val (_, hWith, _, _) = sniff("name,value\nr1,10\nr2,20").head
    val (_, hWithout, _, _) = sniff("r1,10\nr2,20").head
    val (_, hAllText, _, _) = sniff("a,b\nc,d").head
    (hWith, hWithout, hAllText) shouldBe ((1L, 0L, 0L))
  }

  it should "report no delimiter for single-column payloads" in {
    sniff("just\nlines\nof text") shouldBe Seq(("", 0L, 1L, 3L))
  }

  it should "prefer the higher consistent count, then comma" in {
    // both ',' and ';' are consistent; ',' appears twice per line
    sniff("a,b;c,d\ne,f;g,h").head._1 shouldBe ","
  }
}
