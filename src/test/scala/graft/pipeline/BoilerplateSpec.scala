package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

import scala.util.Random

/** [[TextOps.removeBoilerplateGrams]] — every test checks the operator's
  * surviving text against a plain-Scala brute force that enumerates every
  * positional k-gram, counts distinct-document frequency, and cuts every
  * covered token. */
class BoilerplateSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def brute(rows: Seq[(Long, String)], k: Int,
                    minDf: Int): Map[Long, (String, Long)] = {
    val toks = rows.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toVector
    }
    val df = toks
      .flatMap { case (id, tk) =>
        (0 to tk.length - k).map(s => tk.slice(s, s + k).mkString(" ") -> id)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    toks.map { case (id, tk) =>
      val flagged = (0 to tk.length - k)
        .filter(s => df.getOrElse(tk.slice(s, s + k).mkString(" "), 0) >= minDf)
      val covered = flagged.flatMap(s => s until s + k).toSet
      val kept = tk.zipWithIndex.collect { case (t, i) if !covered(i) => t }
      id -> (kept.mkString(" "), (tk.length - kept.length).toLong)
    }.toMap
  }

  private def run(rows: Seq[(Long, String)], k: Int,
                  minDf: Long): Map[Long, (String, Long)] = {
    val s = spark
    import s.implicits._
    TextOps.removeBoilerplateGrams(rows.toDF("doc_id", "text"), k, minDf)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
  }

  "removeBoilerplateGrams" should "cut a banner repeated across enough docs from every carrier" in {
    val banner = "accept all cookies now"
    val rows = Seq(
      1L -> s"unique alpha words $banner trailing body one",
      2L -> s"$banner another body entirely two",
      3L -> s"middle text here $banner",
      4L -> "no banner in this document at all")
    val got = run(rows, k = 4, minDf = 3L)
    got shouldBe brute(rows, 4, 3)
    // the banner is gone from all three carriers, untouched doc intact
    Seq(1L, 2L, 3L).foreach(id => got(id)._1 should not include "cookies")
    got(4L) shouldBe ("no banner in this document at all", 0L)
  }

  it should "keep grams below the document-frequency threshold" in {
    val rows = Seq(
      1L -> "shared pair of docs only here",
      2L -> "shared pair of something else entirely",
      3L -> "completely different content words")
    // "shared pair of" appears in 2 docs < minDf=3 — nothing removed
    val got = run(rows, k = 3, minDf = 3L)
    got shouldBe brute(rows, 3, 3)
    got.values.map(_._2).sum shouldBe 0L
  }

  it should "handle overlapping occurrences, sub-k docs, and full removal" in {
    val rows = Seq(
      1L -> "a b c d a b c d",   // overlapping flagged starts merge coverage
      2L -> "a b c d",           // becomes empty: entirely boilerplate
      3L -> "x a b c d y",
      4L -> "a b",               // shorter than k: kept whole
      5L -> "")                  // zero tokens
    val got = run(rows, k = 4, minDf = 3L)
    got shouldBe brute(rows, 4, 3)
    got(2L) shouldBe ("", 4L)
    got(4L) shouldBe ("a b", 0L)
    got(5L) shouldBe ("", 0L)
  }

  it should "match brute force on random word-salad corpora" in {
    val rnd = new Random(7)
    val vocab = Vector("a", "b", "c", "d", "e")
    val rows = (1L to 60L).map { id =>
      id -> Vector.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    for ((k, mdf) <- Seq((2, 5), (3, 3), (4, 2)))
      run(rows, k, mdf.toLong) shouldBe brute(rows, k, mdf)
  }
}
