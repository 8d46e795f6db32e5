package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** Interpolated Kneser–Ney: bit-parity with a plain-Scala replay of the
  * exact formula, the continuation-probability effect (the "San
  * Francisco" correction), degenerate docs, partitioning invariance. */
class KneserNeySpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Option[Double])] = {
    val s = spark
    import s.implicits._
    TextOps.kneserNeyLogProb(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
  }

  /** The operator's exact math in plain Scala (same parenthesization). */
  private def refScores(docs: Seq[(Long, String)]): Map[Long, (Long, Option[Double])] = {
    val bigrams = docs.flatMap { case (id, t) =>
      val w = t.split("\\s+").filter(_.nonEmpty)
      w.zip(w.drop(1)).map(p => (id, p._1, p._2))
    }
    val c12 = bigrams.groupBy(b => (b._2, b._3)).view.mapValues(_.size).toMap
    val c1 = bigrams.groupBy(_._2).view.mapValues(_.size).toMap
    val n1p = c12.keys.groupBy(_._1).view.mapValues(_.size).toMap
    val ncont = c12.keys.groupBy(_._2).view.mapValues(_.size).toMap
    val ncc = c12.size
    docs.map { case (id, _) =>
      val bs = bigrams.filter(_._1 == id)
      if (bs.isEmpty) id -> ((0L, None))
      else {
        val lps = bs.map { case (_, w1, w2) =>
          math.log((math.max(c12((w1, w2)) - 0.75, 0.0) +
            0.75 * n1p(w1) * ncont(w2) / ncc) / c1(w1))
        }
        val mean = lps.sum / lps.size
        id -> ((bs.size.toLong, Some(math.rint(mean * 1e6) / 1e6 + 0.0)))
      }
    }.toMap
  }

  "kneserNeyLogProb" should "match a plain-Scala replay of the formula" in {
    val rnd = new scala.util.Random(7)
    val words = Seq("san", "francisco", "things", "many", "go", "to", "the")
    val docs = (0L until 30L).map { i =>
      (i, Seq.fill(2 + rnd.nextInt(6))(words(rnd.nextInt(words.size)))
        .mkString(" "))
    }
    val got = run(docs)
    val ref = refScores(docs)
    got.keySet shouldBe ref.keySet
    for (k <- got.keys) {
      got(k)._1 shouldBe ref(k)._1
      (got(k)._2, ref(k)._2) match {
        case (Some(a), Some(b)) => a shouldBe b +- 1e-6
        case (a, b) => a shouldBe b
      }
    }
  }

  it should "score many-context continuations above one-context ones (San Francisco effect)" in {
    val corpus = Seq.tabulate(5)(i => (i.toLong, "san francisco")) ++
      Seq((10L, "p things"), (11L, "q things"), (12L, "r things"),
        (20L, "z francisco"), (21L, "z things"))
    val got = run(corpus)
    // both test bigrams are singletons with the same left context 'z';
    // 'things' completes 4 contexts, 'francisco' only 2 — KN must rank
    // the versatile continuation higher where raw MLE ties them
    got(21L)._2.get should be > got(20L)._2.get
  }

  it should "report (0, null) for docs without bigrams" in {
    run(Seq((0L, "solo"), (1L, " "), (2L, "a b"))) should contain allOf(
      0L -> ((0L, None)), 1L -> ((0L, None)))
  }

  it should "be invariant to input partitioning" in {
    val s = spark
    import s.implicits._
    val docs = (0L until 40L).map(i => (i, s"tok${i % 5} tok${(i + 1) % 7} tok${i % 3}"))
    val df = docs.toDF("doc_id", "text")
    TextOps.kneserNeyLogProb(df.repartition(7)).orderBy("doc_id")
      .collect().toSeq shouldBe
      TextOps.kneserNeyLogProb(df.repartition(1)).orderBy("doc_id")
        .collect().toSeq
  }
}
