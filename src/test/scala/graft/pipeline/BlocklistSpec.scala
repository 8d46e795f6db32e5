package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** C4 bad-words gate: token-exact matching (Scunthorpe decoys must not
  * fire), case folding on both sides, occurrence counting, whitespace
  * tokenization. */
class BlocklistSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def run(texts: (Long, String)*): Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    TextOps.blocklistFilter(texts.toDF("doc_id", "text"),
      Seq("badword", "Verboten"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
  }

  "blocklistFilter" should "flag token-exact hits and count occurrences" in {
    run(
      (1L, "a clean doc"),
      (2L, "one badword here"),
      (3L, "badword twice badword"),
      (4L, "BADWORD in caps and verboten too")) shouldBe Seq(
      (1L, 0L, 0L), (2L, 1L, 1L), (3L, 2L, 1L), (4L, 2L, 1L))
  }

  it should "not fire on a listed word embedded in a longer token" in {
    run(
      (1L, "notabadword embedded"),
      (2L, "badwordsuffix and prefixbadword"),
      (3L, "badword.")) shouldBe Seq(
      // punctuation sticks to whitespace tokens — 'badword.' is a
      // different token, the documented tokens() contract
      (1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 0L))
  }

  it should "handle empty and whitespace-only docs" in {
    run((1L, ""), (2L, "   ")) shouldBe Seq((1L, 0L, 0L), (2L, 0L, 0L))
  }

  it should "reject an empty blocklist" in {
    val s = spark
    import s.implicits._
    an[IllegalArgumentException] should be thrownBy
      TextOps.blocklistFilter(Seq((1L, "x")).toDF("doc_id", "text"), Nil)
  }
}
