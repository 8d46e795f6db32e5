package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.tsne.SparkTestBase

/** The CCNet head/middle/tail split: the reference-trained KN scorer's
  * unseen-event floors, per-language keying, and the tertile labeling —
  * on hand fixtures where the right answer is arguable by eye. */
class CcnetSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def docsDf(rows: Seq[(Long, String, String, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
  }

  "kneserNeyScore" should "score reference-like text above shuffled/OOV text" in {
    val ref = "the cat sat on the mat and the dog sat on the rug"
    val docs = docsDf(Seq(
      (1L, ref, "en", "src0"),                  // the reference itself
      (2L, "the cat sat on the mat", "en", "srcX"),   // in-distribution
      (3L, "mat the on sat cat the", "en", "srcX"),   // shuffled
      (4L, "zz qq ww ee rr tt", "en", "srcX")))       // fully OOV
    val model = TextOps.kneserNeyModel(docs.where(col("source") === "src0"))
    val s = spark
    import s.implicits._
    val scores = TextOps.kneserNeyScore(docs, model)
      .select("doc_id", "score_r").as[(Long, Option[Double])]
      .collect().toMap
    scores(2L).get should be > scores(3L).get
    scores(3L).get should be > scores(4L).get
    // the OOV doc scores exactly the floor: every bigram hits
    // p = 1/(ncc+1), so the mean is ln of it
    val ncc = model.ncc.select("ncc").as[Long].collect().head
    scores(4L).get shouldBe
      (math.rint(math.log(1.0 / (ncc + 1.0)) * 1e6) / 1e6) +- 1e-6
  }

  it should "key the model by language and null-score uncovered languages" in {
    val docs = docsDf(Seq(
      (1L, "le chat noir dort", "fr", "src0"),
      (2L, "le chat noir dort", "fr", "srcX"),
      (3L, "le chat noir dort", "de", "srcX"), // same words, no de reference
      (4L, "one", "fr", "srcX")))              // < 2 tokens
    val model = TextOps.kneserNeyModel(docs.where(col("source") === "src0"))
    val s = spark
    import s.implicits._
    val got = TextOps.kneserNeyScore(docs, model)
      .select("doc_id", "n_bigrams", "score_r")
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    got(2L)._2.isDefined shouldBe true
    got(3L) shouldBe ((0L, None)) // de has no model → unscorable
    got(4L) shouldBe ((0L, None))
  }

  "ccnetBuckets" should "put reference-like docs in head and OOV docs in tail, per language" in {
    val refEn = "the cat sat on the mat and the dog sat on the rug"
    val en = Seq(
      (10L, refEn, "en", "src0"),
      (11L, "the cat sat on the mat", "en", "srcX"),
      (12L, "the dog sat on the rug", "en", "srcX"),
      (13L, "mat rug dog cat sat on", "en", "srcX"),
      (14L, "zz qq ww ee rr tt", "en", "srcX"),
      (15L, "qq zz ee ww tt rr", "en", "srcX"))
    val fr = Seq(
      (20L, "le chat noir dort bien le chat gris dort mal", "fr", "src0"),
      (21L, "le chat noir dort bien", "fr", "srcX"),
      (22L, "le chat gris dort mal", "fr", "srcX"),
      (23L, "dort le mal chat gris", "fr", "srcX"),
      (24L, "xx yy zz aa bb cc", "fr", "srcX"),
      (25L, "aa bb cc xx yy zz", "fr", "srcX"))
    val s = spark
    import s.implicits._
    val got = TextOps.ccnetBuckets(docsDf(en ++ fr))
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    // 6 docs per lang → tertiles of 2: the reference doc + the most
    // in-distribution ones land in head, the OOV pair in tail
    Seq(14L, 15L, 24L, 25L).foreach(id => got(id) shouldBe "tail")
    Seq(10L, 20L).foreach(id => got(id) should not be "tail")
    got.values.toSet shouldBe Set("head", "middle", "tail")
  }

  it should "send unscorable docs to tail and stay partition-invariant" in {
    val base = Seq(
      (1L, "a b a b a c", "en", "src0"),
      (2L, "a b a c", "en", "srcX"),
      (3L, "c a b a", "en", "srcX"),
      (4L, "solo", "en", "srcX"),               // < 2 tokens → tail
      (5L, "w x y z", "zz", "srcX"))            // uncovered lang → tail
    val s = spark
    import s.implicits._
    val a = TextOps.ccnetBuckets(docsDf(base).repartition(7))
      .orderBy("doc_id").collect().toSeq
    val b = TextOps.ccnetBuckets(docsDf(base).repartition(1))
      .orderBy("doc_id").collect().toSeq
    a shouldBe b
    val buckets = a.map(r => r.getLong(0) -> r.getString(4)).toMap
    buckets(4L) shouldBe "tail"
    buckets(5L) shouldBe "tail"
  }
}
