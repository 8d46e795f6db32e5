package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** [[Bpe]] — BPE vocabulary learning. The claims under test: parity with
  * a canonical plain-Scala trainer (greedy left-to-right merge, ties by
  * (left, right) ascending) including the repeated-pair words that break
  * a naive single-`replace` merge, early stop below minCount,
  * partitioning invariance, and the segment-side subword counts. */
class BpeSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  /** Canonical BPE trainer over a word-count map. */
  private def refBpe(words: Map[String, Long], nMerges: Int,
                     minCount: Long = 2L): Seq[(Int, String, String, Long)] = {
    var vocab: Map[List[String], Long] = words.groupMapReduce {
      case (w, _) => w.map(_.toString).toList :+ "</w>"
    }(_._2)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var go = true
    while (step <= nMerges && go) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach { p =>
          pairs.update(p, pairs.getOrElse(p, 0L) + c)
        }
      }
      val best = pairs.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= minCount =>
          out += ((step, l, r, c))
          // greedy left-to-right single-rule merge
          def mergeWord(s: List[String]): List[String] = s match {
            case a :: b :: rest if a == l && b == r =>
              (a + b) :: mergeWord(rest)
            case a :: rest => a :: mergeWord(rest)
            case Nil => Nil
          }
          vocab = vocab.groupMapReduce { case (s, _) => mergeWord(s) }(_._2)(_ + _)
          step += 1
        case _ => go = false
      }
    }
    out.toSeq
  }

  /** Canonical per-token subword count under a merge list. */
  private def refSegCount(tok: String, merges: Seq[(String, String)]): Long = {
    var syms = tok.map(_.toString).toList :+ "</w>"
    merges.foreach { case (l, r) =>
      def m(s: List[String]): List[String] = s match {
        case a :: b :: rest if a == l && b == r => (a + b) :: m(rest)
        case a :: rest => a :: m(rest)
        case Nil => Nil
      }
      syms = m(syms)
    }
    syms.size.toLong
  }

  private def mkDocs(texts: Seq[String]) = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private def wordCounts(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split("\\s+").filter(_.nonEmpty))
      .groupMapReduce(identity)(_ => 1L)(_ + _)

  "Bpe.learnMerges" should "match the canonical trainer on the paper's corpus shape" in {
    // the classic low/lower/newest/widest flavour
    val texts = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = mkDocs(Seq(texts.mkString(" ")))
    val got = Bpe.learnMerges(docs, 8).collect()
      .map(r => (r.getLong(0).toInt, r.getString(1), r.getString(2), r.getLong(3)))
    got.toSeq shouldBe refBpe(wordCounts(texts), 8)
  }

  it should "handle repeated-pair words that need the second replace pass" in {
    // "xyxyxy": after (x,y) merges, a naive single replace leaves the
    // middle occurrence unmerged; the canonical fold yields [xy xy xy </w>]
    val texts = Seq.fill(4)("xyxyxy") ++ Seq.fill(3)("xyx") ++ Seq("zz zz")
    val docs = mkDocs(texts)
    val got = Bpe.learnMerges(docs, 6).collect()
      .map(r => (r.getLong(0).toInt, r.getString(1), r.getString(2), r.getLong(3)))
    got.toSeq shouldBe refBpe(wordCounts(texts), 6)
  }

  it should "stop early when no pair reaches minCount and be partitioning-invariant" in {
    val texts = Seq("ab", "cd", "ab")
    val docs = mkDocs(texts)
    val got = Bpe.learnMerges(docs, 10).collect()
    // only (a,b) with count 2 and then (ab,</w>) with count 2 survive;
    // afterwards every remaining pair is a hapax
    val want = refBpe(wordCounts(texts), 10)
    got.length shouldBe want.size
    val re = Bpe.learnMerges(docs.repartition(7), 10).collect()
      .map(r => (r.getLong(0).toInt, r.getString(1), r.getString(2), r.getLong(3)))
    re.toSeq shouldBe want
  }

  "Bpe.segment" should "count subwords exactly as the canonical merge-by-merge segmentation" in {
    val texts = Seq.fill(5)("low lower") ++ Seq.fill(6)("newest widest xyxyxy")
    val docs = mkDocs(texts)
    val merges = Bpe.learnMerges(docs, 6).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val got = Bpe.segment(docs, merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.split("\\s+").filter(_.nonEmpty)
      val want = toks.map(refSegCount(_, merges)).sum
      got(i.toLong) shouldBe ((toks.length.toLong, want))
    }
  }

  private def pretok(text: String): Seq[String] = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    Seq(text).toDF("t").select(Bpe.pretokenize(col("t")))
      .as[Seq[String]].collect().head
  }

  "pretokenize" should "split the GPT-2 way: contractions, runs, spaces" in {
    pretok("Let's don't re-run 42 times!!") shouldBe Seq(
      "Let", "'s", " don", "'t", " re", "-", "run", " 42", " times", "!!")
  }

  it should "keep digit runs apart from letters and fold the space in" in {
    pretok("the 42nd item costs $3.50") shouldBe Seq(
      "the", " 42", "nd", " item", " costs", " $", "3", ".", "50")
  }

  it should "be lossless: pieces concatenate back to the input" in {
    val texts = Seq("Let's don't re-run 42 times!!",
      "  leading and   internal\truns\n", "no-punct", "")
    texts.foreach(t => pretok(t).mkString("") shouldBe t)
  }
}
