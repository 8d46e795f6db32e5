package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.tsne.SparkTestBase

/** Sentence segmentation: plain splits, abbreviation/initial re-merge,
  * decimal re-merge, trailing fragments, and the non-greedy cases where
  * a word merely ENDS in a listed letter. */
class SentenceSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def split(texts: String*): Seq[Seq[String]] = {
    val s = spark
    import s.implicits._
    texts.toDF("text").select(TextOps.sentences(col("text")))
      .as[Seq[String]].collect().toSeq
  }

  "sentences" should "split on terminator runs and trim" in {
    split("One here. Two there!  Three?? Four.") shouldBe
      Seq(Seq("One here.", "Two there!", "Three??", "Four."))
  }

  it should "not split after abbreviations or initials" in {
    split("Dr. Smith met Prof. Jones. He left at 5 p.m. today. J. K. wrote.") shouldBe
      Seq(Seq("Dr. Smith met Prof. Jones.",
        "He left at 5 p.m. today.", "J. K. wrote."))
  }

  it should "not split inside decimals or version numbers" in {
    split("Version 2.5 shipped on 3.14 day. Pi is 3.14159. Done.") shouldBe
      Seq(Seq("Version 2.5 shipped on 3.14 day.", "Pi is 3.14159.", "Done."))
  }

  it should "split after a word that merely ends in a listed letter" in {
    // `sharp.` ends in `p` but `p` is word-internal — a real boundary
    split("It was sharp. Next came.") shouldBe
      Seq(Seq("It was sharp.", "Next came."))
  }

  it should "keep an unterminated trailing fragment" in {
    split("Done here. And then the crawl cut") shouldBe
      Seq(Seq("Done here.", "And then the crawl cut"))
    split("no terminator at all") shouldBe Seq(Seq("no terminator at all"))
  }

  it should "handle empty and terminator-only text" in {
    split("", "...", "!?") shouldBe Seq(Seq(), Seq(), Seq())
  }

  it should "split a digit-terminated sentence before a word" in {
    // digit re-merge requires a DIGIT on the right: `…was 42. Next…`
    // is a true boundary
    split("The answer was 42. Next question.") shouldBe
      Seq(Seq("The answer was 42.", "Next question."))
  }
}
