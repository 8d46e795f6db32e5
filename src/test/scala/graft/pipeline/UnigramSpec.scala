package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.tsne.SparkTestBase

/** Unigram Viterbi segmentation: the min-cost DP pinned on hand-built
  * models (Viterbi beats greedy where greedy traps itself, smallest-l
  * tie rule), bit-parity with a plain-Scala Viterbi on the learned
  * model, model learning determinism, and partitioning invariance. */
class UnigramSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  /** Single chars at cost 10 each (plus extras) — a convenient base
    * model covering any lowercase word. */
  private def baseModel(extra: (String, Long)*): Seq[(String, Long)] =
    ('a' to 'z').map(c => (c.toString, 10L)) ++ extra

  private def segRow(model: Seq[(String, Long)], words: String*)
      : Seq[(Long, Long)] = {
    val s = spark
    import s.implicits._
    val docs = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    Unigram.segment(docs, model).orderBy("doc_id")
      .select(col("n_uni_tokens"), col("uni_cost"))
      .as[(Long, Long)].collect().toSeq
  }

  "segment" should "find the min-cost split, not the greedy one" in {
    // vocab {ab:6, bcd:3}: greedy longest-match on "abcd" takes
    // ab|c|d = 6+10+10 = 26; Viterbi takes a|bcd = 10+3 = 13
    segRow(baseModel("ab" -> 6L, "bcd" -> 3L), "abcd") shouldBe
      Seq((2L, 13L))
    // but when the long first piece IS optimal, it wins
    segRow(baseModel("ab" -> 1L, "cd" -> 1L), "abcd") shouldBe
      Seq((2L, 2L))
  }

  it should "prefer cheaper pieces among equal-length splits" in {
    // "xy" via {xy:5} beats x|y (20); via {xy:25} the singles win
    segRow(baseModel("xy" -> 5L), "xy") shouldBe Seq((1L, 5L))
    segRow(baseModel("xy" -> 25L), "xy") shouldBe Seq((2L, 20L))
  }

  it should "break cost ties toward the smallest piece length per cursor" in {
    val s = spark
    import s.implicits._
    // {ab:20} ties ab with a|b (both 20): backtracking takes the
    // SMALLEST l at the final cursor, so the split a|b wins
    val docs = Seq((0L, "ab")).toDF("doc_id", "text")
    val got = Unigram.segment(docs, baseModel("ab" -> 20L))
      .select("n_uni_tokens", "seg_sig").as[(Long, Long)].collect().head
    got._1 shouldBe 2L
    got._2 shouldBe Hashing.hash60("a b") % 1000000007L
  }

  it should "reduce per doc over occurrences, empty docs included" in {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "aa aa bb"), (1L, " ")).toDF("doc_id", "text")
    val got = Unigram.segment(docs, baseModel("aa" -> 3L))
      .orderBy("doc_id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    got.map(r => (r._1, r._2, r._3, r._4)) shouldBe
      Seq((0L, 3L, 4L, 26L), (1L, 0L, 0L, 0L)) // aa ×2 (3 each) + b|b (20)
    val sigAA = Hashing.hash60("aa") % 1000000007L
    val sigBB = Hashing.hash60("b b") % 1000000007L
    got.head._5 shouldBe (2 * sigAA + sigBB)
  }

  /** Plain-Scala Viterbi with the operator's exact tie rules. */
  private def refViterbi(w: String, model: Map[String, Long],
                         maxLen: Int = 6): (String, Long) = {
    val n = w.length
    val best = Array.fill(n + 1)(Long.MaxValue)
    best(0) = 0L
    for (i <- 1 to n; l <- 1 to math.min(maxLen, i)) {
      model.get(w.substring(i - l, i)).foreach { c =>
        if (best(i - l) != Long.MaxValue && best(i - l) + c < best(i))
          best(i) = best(i - l) + c
      }
    }
    val pieces = scala.collection.mutable.ListBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val l = (1 to math.min(maxLen, pos)).find { l =>
        model.get(w.substring(pos - l, pos))
          .exists(c => best(pos) == best(pos - l) + c)
      }.get
      w.substring(pos - l, pos) +=: pieces
      pos -= l
    }
    (pieces.mkString(" "), best(n))
  }

  it should "match a plain-Scala Viterbi on the learned corpus model" in {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val words = Seq("interchange", "internal", "change", "changes",
      "exchange", "nation", "national", "inter", "altern", "alternate")
    val docs = (0L until 40L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(5))(words(rnd.nextInt(words.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val model = Unigram.learnModel(docs, k = 12)
    val m = model.toMap
    m.size shouldBe model.size // no duplicate units
    val got = Unigram.segment(docs, model).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    val texts = docs.orderBy("doc_id").as[(Long, String)].collect()
    for (((id, text), row) <- texts.zip(got)) {
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val refs = toks.map(w => refViterbi(w, m))
      row._1 shouldBe id
      row._2 shouldBe toks.length.toLong
      row._3 shouldBe refs.map(_._1.split(" ").length.toLong).sum
      row._4 shouldBe refs.map(_._2).sum
      row._5 shouldBe refs.map(r =>
        Hashing.hash60(r._1) % 1000000007L).sum
    }
  }

  it should "be invariant to input partitioning" in {
    val s = spark
    import s.implicits._
    val docs = (0L until 30L)
      .map(i => (i, s"alpha bet${i % 3} gamma alphabet"))
      .toDF("doc_id", "text")
    val model = Unigram.learnModel(docs)
    val a = Unigram.segment(docs.repartition(1), model)
      .orderBy("doc_id").collect().toSeq
    val b = Unigram.segment(docs.repartition(7), model)
      .orderBy("doc_id").collect().toSeq
    a shouldBe b
  }

  "learnModel" should "cover every corpus character and rank multis deterministically" in {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "abab abab cdcd")).toDF("doc_id", "text")
    val model = Unigram.learnModel(docs, k = 3)
    val m = model.toMap
    Set("a", "b", "c", "d").subsetOf(m.keySet) shouldBe true
    // 'ab' occurs 2 per word × 2 occurrences = 4, ilog2=2 → 62;
    // singles a/b: 4 → 62; c/d: 2 → 63
    m("a") shouldBe 62L
    m("c") shouldBe 63L
    m("ab") shouldBe 62L
    // rank (count desc, unit asc): ab(4), ba(2), then 'aba' (2) — ties
    // broken bytewise
    val multis = model.filter(_._1.length >= 2).map(_._1)
    multis.head shouldBe "ab"
  }
}
