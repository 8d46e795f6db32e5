package graft.pipeline

import org.apache.spark.sql.functions._
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

  behavior of "TextOps.skipgramCounts"

  it should "emit every directed pair within the window, clipped at doc ends" in {
    import s.implicits._
    // tokens: a b c d  with window 2 →
    //   ab, ac, bc, bd, cd  (never ad — distance 3)
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val got = TextOps.skipgramCounts(docs, window = 2, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    got shouldBe Map(
      ("a", "b") -> 1L, ("a", "c") -> 1L, ("b", "c") -> 1L,
      ("b", "d") -> 1L, ("c", "d") -> 1L)
  }

  it should "reduce to bigram adjacency at window 1 and skip 1-token docs" in {
    import s.implicits._
    val docs = Seq((1L, "a b a"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val got = TextOps.skipgramCounts(docs, window = 1, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    got shouldBe Map(("a", "b") -> 1L, ("b", "a") -> 1L)
  }

  it should "match the positional-self-join spelling on a random corpus" in {
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Array("u", "v", "w", "x", "y", "z")
    val docs = (1L to 40L).map(i =>
      (i, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")))
      .toDF("doc_id", "text").persist()
    val tp = docs.select(col("doc_id"),
      posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "w")))
    val expect = tp.as("a").join(tp.as("b"),
      col("a.doc_id") === col("b.doc_id") &&
        col("b.pos") > col("a.pos") && col("b.pos") <= col("a.pos") + 3)
      .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val got = TextOps.skipgramCounts(docs, window = 3, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    got shouldBe expect
    docs.unpersist()
  }

  it should "plan the pair generation without a join node" in {
    import s.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextOps.skipgramCounts(docs, window = 3, minCount = 1L)
      .queryExecution.executedPlan.toString
    plan.toLowerCase should not include "join"
  }
}
