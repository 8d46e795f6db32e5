package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.tsne.SparkTestBase

/** WordPiece greedy longest-match: the rule pinned on hand-built vocab
  * and words (longest wins, cursor never backtracks, single-char
  * fallback), vocab learning determinism, and the per-doc reduction. */
class WordpieceSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  /** Segment one word with a fixed vocab via the public operator,
    * reading back the piece count. */
  private def pieces(vocab: Seq[String], words: String*): Seq[Long] = {
    val s = spark
    import s.implicits._
    val docs = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    Wordpiece.segment(docs, vocab).orderBy("doc_id")
      .select("n_wp_tokens").as[Long].collect().toSeq
  }

  "segment" should "take the longest match at each cursor position" in {
    // "unhappy": un|happy with both in vocab beats u|n|h|a|p|p|y
    pieces(Seq("un", "happy"), "unhappy") shouldBe Seq(2L)
    // longer unit wins over its own prefix: "happ" < "happy"
    pieces(Seq("happ", "happy"), "happy") shouldBe Seq(1L)
    pieces(Seq("happ", "happy"), "happyx") shouldBe Seq(2L) // happy + x
  }

  it should "never backtrack (greedy can beat itself — that's the rule)" in {
    // vocab {ab, bcd}: greedy on "abcd" takes ab|c|d (3 pieces), not
    // a|bcd (2) — the documented greedy property, pinned so a future
    // "optimal" rewrite can't silently change semantics
    pieces(Seq("ab", "bcd"), "abcd") shouldBe Seq(3L)
  }

  it should "fall back to single chars when nothing matches" in {
    pieces(Seq("zz"), "abc") shouldBe Seq(3L)
    pieces(Seq.empty, "abc") shouldBe Seq(3L)
  }

  it should "reduce per doc over occurrences, empty docs included" in {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "aa aa bb"), (1L, " ")).toDF("doc_id", "text")
    val got = Wordpiece.segment(docs, Seq("aa"))
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    got.map(r => (r._1, r._2, r._3)) shouldBe
      Seq((0L, 3L, 4L), (1L, 0L, 0L)) // aa=1 piece ×2, bb=2 pieces
    // seg_sig: 2·sig("aa") + sig("b b"), order-free
    val sigAA = Hashing.hash60("aa") % 1000000007L
    val sigBB = Hashing.hash60("b b") % 1000000007L
    got.head._4 shouldBe (2 * sigAA + sigBB)
  }

  "learnVocab" should "rank by weighted count then unit, deterministically" in {
    val s = spark
    import s.implicits._
    // "abab" ×3, "abc" ×1 → top substrings: ab (2·3+1=7), then ba (3),
    // aba/bab/abab (3 each — tie broken alphabetically), bc (1), abc (1)
    val docs = Seq((0L, "abab abab"), (1L, "abab abc"))
      .toDF("doc_id", "text")
    val v = Wordpiece.learnVocab(docs, k = 5, maxLen = 4)
    v shouldBe Seq("ab", "aba", "abab", "ba", "bab")
  }

  it should "segment differently from BPE merge order on the right corpus" in {
    // BPE merges replay in learned order; greedy always takes the
    // longest unit. With vocab {ab, bcd} the word "abcd" shows the gap
    // (greedy: ab|c|d). A BPE that learned (b,c)→bc then (bc,d)→bcd
    // would give a|bcd. This pin documents the semantic difference the
    // two operators exist to offer.
    pieces(Seq("ab", "bcd"), "abcd") should not be Seq(2L)
  }
}
