package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** PMI collocations against hand-computed values on a corpus small enough
  * to count on paper. */
class PmiSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private lazy val s = spark

  behavior of "TextOps.pmiCollocations"

  it should "match hand-computed PMI on a tiny corpus" in {
    import s.implicits._
    // bigram events: ab x3, ba x1, bc x1, bb x1  -> N = 6
    // c1 (as left):  a=3, b=3      c2 (as right): b=4, a=1, c=1
    val docs = Seq(
      (1L, "a b a b c"),   // ab, ba, ab, bc
      (2L, "a b b")        // ab, bb
    ).toDF("doc_id", "text")
    val got = TextOps.pmiCollocations(docs, minCount = 1L)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    def pmi(c12: Long, c1: Long, c2: Long): Double =
      BigDecimal(math.log(c12.toDouble * 6.0 / (c1.toDouble * c2.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got(("a", "b")) shouldBe ((3L, pmi(3, 3, 4)))   // ln 1.5
    got(("b", "a")) shouldBe ((1L, pmi(1, 3, 1)))   // ln 2
    got(("b", "c")) shouldBe ((1L, pmi(1, 3, 1)))   // ln 2
    got(("b", "b")) shouldBe ((1L, pmi(1, 3, 4)))   // ln 0.5 — negative
    got.size shouldBe 4
  }

  it should "drop pairs below minCount (the hapax-PMI trap)" in {
    import s.implicits._
    val docs = Seq(
      (1L, "x y x y x y"), // xy x3, yx x2
      (2L, "q r")          // qr x1 — maximal PMI, minimal evidence
    ).toDF("doc_id", "text")
    val pairs = TextOps.pmiCollocations(docs, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    pairs shouldBe Set(("x", "y"), ("y", "x"))
  }
}
