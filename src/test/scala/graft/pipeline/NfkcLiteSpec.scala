package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.tsne.SparkTestBase

/** NFKC-lite normalization: every rule class pinned with explicit
  * escapes (quotes, dashes, ligatures, fullwidth, exotic spaces,
  * control chars, whitespace collapse, line preservation). */
class NfkcLiteSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def norm(texts: String*): Seq[String] = {
    val s = spark
    import s.implicits._
    texts.toDF("text").select(TextOps.nfkcLite(col("text"))).as[String]
      .collect().toSeq
  }

  "nfkcLite" should "straighten typographic quotes and dashes" in {
    norm("“q” ‘s’ a–b c—d e−f") shouldBe
      Seq("\"q\" 's' a-b c-d e-f")
  }

  it should "expand ligatures and fold fullwidth ASCII" in {
    norm("ﬁle ﬂy Ｈｉ ２０２６") shouldBe
      Seq("file fly Hi 2026")
  }

  it should "unify exotic spaces and drop zero-width/soft-hyphen/controls" in {
    norm("x y z　w", "a​b c­d", "bells") shouldBe
      Seq("x y z w", "ab cd", "bells")
  }

  it should "collapse space/tab runs but keep and trim lines" in {
    norm("  a \t b  \nline\ttwo  \n\n c ") shouldBe Seq("a b\nline two\n\nc")
  }

  it should "leave already-clean ASCII unchanged" in {
    val clean = "plain ascii text, 123 (ok)."
    norm(clean) shouldBe Seq(clean)
  }

  it should "fold the Unicode ellipsis to the ASCII spelling" in {
    norm("wait for it… done") shouldBe Seq("wait for it... done")
  }
}
