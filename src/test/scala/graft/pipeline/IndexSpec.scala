package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.tsne.SparkTestBase

/** Phrase inverted index: postings, positions, df-band pruning, and the
  * short-document guard must all match a by-hand index of a tiny corpus. */
class IndexSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "a b c a b c"),   // grams: "a b c"@0,3? no — "a b c"@0, "b c a"@1, "c a b"@2, "a b c"@3
      (2L, "a b c d"),       // "a b c"@0, "b c d"@1
      (3L, "x y"),           // shorter than n=3: contributes nothing
      (4L, "b c d e")        // "b c d"@0, "c d e"@1
    ).toDF("doc_id", "text")
  }

  "phraseIndex" should "match the by-hand index (minDf=1: complete)" in {
    val rows = Index.phraseIndex(docs, n = 3, minDf = 1, maxDf = 100)
      .collect()
      .map(r => (r.getAs[String]("gram"), r.getAs[Long]("doc_id")) ->
        ((r.getAs[Long]("df"), r.getAs[Long]("tf"), r.getAs[String]("pos_csv"))))
      .toMap
    rows(("a b c", 1L)) shouldBe ((2L, 2L, "0,3"))
    rows(("a b c", 2L)) shouldBe ((2L, 1L, "0"))
    rows(("b c a", 1L)) shouldBe ((1L, 1L, "1"))
    rows(("c a b", 1L)) shouldBe ((1L, 1L, "2"))
    rows(("b c d", 2L)) shouldBe ((2L, 1L, "1"))
    rows(("b c d", 4L)) shouldBe ((2L, 1L, "0"))
    rows(("c d e", 4L)) shouldBe ((1L, 1L, "1"))
    // doc 3 is shorter than the gram width: no posting anywhere (and no
    // descending-sequence explosion from the size guard)
    rows.keys.map(_._2) should not contain 3L
    rows should have size 7
  }

  it should "prune to the df band" in {
    val kept = Index.phraseIndex(docs, n = 3, minDf = 2, maxDf = 100)
      .select("gram").distinct().collect().map(_.getString(0)).toSet
    kept shouldBe Set("a b c", "b c d")
    // maxDf caps the hot grams too
    val capped = Index.phraseIndex(docs, n = 3, minDf = 1, maxDf = 1)
      .select("gram").distinct().collect().map(_.getString(0)).toSet
    capped shouldBe Set("b c a", "c a b", "c d e")
  }

  "probe" should "return exactly the postings of the probe grams" in {
    val s = spark
    import s.implicits._
    val idx = Index.phraseIndex(docs, n = 3, minDf = 1, maxDf = 100)
    val probes = Seq("a b c", "nope nope nope").toDF("gram")
    val hits = Index.probe(idx, probes)
      .select("gram", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    hits shouldBe Set(("a b c", 1L), ("a b c", 2L))
  }
}
