package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** The Gopher rule gate: every rule's pass AND fail arm pinned on
  * hand-built documents (the driver row's fixture only exercises some
  * failing arms), plus integer-threshold edges and the conjunction. */
class GopherRulesSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  /** Run the gate (word bounds relaxed so short hand docs isolate the
    * OTHER rules) and return the named flag for each doc. */
  private def flags(col: String, minWords: Int, docs: String*): Seq[Long] = {
    val s = spark
    import s.implicits._
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    TextOps.gopherRules(df, minWords = minWords).orderBy("doc_id")
      .select(col).as[Long].collect().toSeq
  }

  private val fluent =
    "the cat and the dog have words to say of that with more here now"

  "gopherRules" should "bound the word count inclusively" in {
    flags("r_words", 3, "one two three", "one two", "") shouldBe
      Seq(1L, 0L, 0L)
  }

  it should "bound mean word length to [3, 10]" in {
    // 2-char words fail low; 11-char words fail high; 3 and 10 pass
    flags("r_meanlen", 1, "ab cd ef", "abcdefghijk xyzabcdefgh",
      "abc def", "abcdefghij") shouldBe Seq(0L, 0L, 1L, 1L)
  }

  it should "fail on symbol-heavy text and pass at the 10% boundary" in {
    // 1 hash per 10 words = exactly 0.1 → pass; 2 per 10 → fail;
    // '...' counts like '#'
    flags("r_symbol", 1, "# a b c d e f g h i",
      "# # a b c d e f g h", "a... b c d e f g h i j",
      "a... b... c d e f g h i j") shouldBe Seq(1L, 0L, 1L, 0L)
  }

  it should "fail bullet-dominated and ellipsis-heavy line sets" in {
    // 10 lines all bullets → fail; 9 of 10 → pass (≤ 90%)
    val allBullets = (1 to 10).map(i => s"- item $i").mkString("\n")
    val nineOfTen = ((1 to 9).map(i => s"- item $i") :+ "prose line here")
      .mkString("\n")
    flags("r_bullet", 1, allBullets, nineOfTen) shouldBe Seq(0L, 1L)
    // 4 of 10 lines end '...' → fail (> 30%); 3 of 10 → pass
    val fourEll = ((1 to 4).map(i => s"line $i...") ++
      (5 to 10).map(i => s"line $i")).mkString("\n")
    val threeEll = ((1 to 3).map(i => s"line $i...") ++
      (4 to 10).map(i => s"line $i")).mkString("\n")
    flags("r_ellipsis", 1, fourEll, threeEll) shouldBe Seq(0L, 1L)
  }

  it should "count the Unicode ellipsis … like the ASCII spelling in both rules" in {
    // symbol ratio: one '…' per 10 words = 0.1 → pass; two → fail
    flags("r_symbol", 1, "a… b c d e f g h i j",
      "a… b… c d e f g h i j") shouldBe Seq(1L, 0L)
    // line-ending rule: 4 of 10 lines ending '…' → fail; 3 of 10 → pass
    val fourEll = ((1 to 4).map(i => s"line $i…") ++
      (5 to 10).map(i => s"line $i")).mkString("\n")
    val threeEll = ((1 to 3).map(i => s"line $i…") ++
      (4 to 10).map(i => s"line $i")).mkString("\n")
    flags("r_ellipsis", 1, fourEll, threeEll) shouldBe Seq(0L, 1L)
  }

  it should "require 80% of words to contain a letter" in {
    // 4 of 5 alpha → pass exactly; 3 of 5 → fail
    flags("r_alpha", 1, "aa bb cc dd 11", "aa bb cc 11 22") shouldBe
      Seq(1L, 0L)
  }

  it should "require two distinct Gopher stop words (repeats don't count twice)" in {
    flags("r_stop", 1, "the cat the mat the hat", "the cat and mat",
      "cat mat hat") shouldBe Seq(0L, 1L, 0L)
  }

  it should "pass a fluent document end to end and report the conjunction" in {
    val s = spark
    import s.implicits._
    val df = Seq((0L, fluent), (1L, "## ## ##")).toDF("doc_id", "text")
    val got = TextOps.gopherRules(df, minWords = 5).orderBy("doc_id")
      .select("gopher_pass").as[Long].collect().toSeq
    got shouldBe Seq(1L, 0L)
  }

  it should "be invariant to input partitioning" in {
    val s = spark
    import s.implicits._
    val df = (0L until 40L).map(i => (i, s"$fluent extra$i")).toDF("doc_id", "text")
    TextOps.gopherRules(df.repartition(7), minWords = 5)
      .orderBy("doc_id").collect().toSeq shouldBe
      TextOps.gopherRules(df.repartition(1), minWords = 5)
        .orderBy("doc_id").collect().toSeq
  }
}
