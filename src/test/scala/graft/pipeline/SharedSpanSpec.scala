package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

import scala.util.Random

/** [[Dedup.sharedSpanPairs]] — the winnowing anchor phase is claimed
  * lossless for spans >= minLen; every test checks the operator's pair
  * set (and n_shared counts) against a plain-Scala all-offsets
  * brute force. */
class SharedSpanSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def brute(rows: Seq[(Long, String)], L: Int): Map[(Long, Long), Long] = {
    val gramSets = rows.collect { case (id, t) if t.length >= L =>
      id -> (0 to t.length - L).map(p => t.substring(p, p + L)).toSet
    }
    (for {
      (i, ga) <- gramSets; (j, gb) <- gramSets if i < j
      n = (ga & gb).size if n > 0
    } yield (i, j) -> n.toLong).toMap
  }

  private def run(rows: Seq[(Long, String)], L: Int, w: Int): Map[(Long, Long), Long] = {
    val s = spark
    import s.implicits._
    Dedup.sharedSpanPairs(rows.toDF("doc_id", "text"), minLen = L, gramWidth = w)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  "sharedSpanPairs" should "flag a shared quotation inside otherwise-unrelated text" in {
    val quote = "the quick brown fox jumps over the lazy dog every single morning"
    val rows = Seq(
      1L -> s"completely unrelated preamble text here. $quote and then some more",
      2L -> s"different document entirely but it cites: $quote with commentary",
      3L -> "no shared content in this one at all, nothing to see here friends")
    val got = run(rows, L = 40, w = 16)
    got.keySet shouldBe Set((1L, 2L))
    got shouldBe brute(rows, 40)
  }

  it should "match the all-offsets brute force on a corpus with planted spans" in {
    val rnd = new Random(13)
    val alpha = "abcdefghij "
    def randStr(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val sharedRuns = (1 to 5).map(_ => randStr(60))
    var id = 0L
    val rows = (1 to 60).map { _ =>
      id += 1
      val base = randStr(80 + rnd.nextInt(120))
      // ~half the docs get a planted run (possibly truncated below minLen,
      // so some plants must NOT match), inserted at a random offset
      if (rnd.nextBoolean()) {
        val run = sharedRuns(rnd.nextInt(sharedRuns.length))
          .take(25 + rnd.nextInt(36)) // 25..60 chars: below and above L=40
        val at = rnd.nextInt(base.length)
        id -> (base.substring(0, at) + run + base.substring(at))
      } else id -> base
    }
    run(rows, L = 40, w = 16) shouldBe brute(rows, 40)
  }

  it should "count repeated and multiple distinct shared runs exactly" in {
    val a = "x" * 50 // degenerate: one distinct 40-gram, max self-overlap
    val runA = "shared segment alpha comes here padded!!"  // exactly 40
    val runB = "another mutual block of text sits here!!"  // exactly 40
    val rows = Seq(
      1L -> (a + "---" + runA + "___" + runB),
      2L -> (runB + "~~~" + a + ";;;" + runA),
      3L -> (runA + runA)) // repeated run, still the same distinct grams
    run(rows, L = 40, w = 16) shouldBe brute(rows, 40)
  }

  it should "produce nothing for docs shorter than minLen and handle nulls" in {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "short"), (2L, "short")).toDF("doc_id", "text")
      .unionByName(Seq(3L).toDF("doc_id").withColumn("text", lit(null).cast("string")))
    Dedup.sharedSpanPairs(df, minLen = 40, gramWidth = 16).count() shouldBe 0L
  }

  // ---- removal ---------------------------------------------------------

  /** All-offsets reference for removeSharedSpans: per-gram min-doc
    * ownership, covered position union, surviving chars in order. */
  private def bruteRemove(rows: Seq[(Long, String)], L: Int): Map[Long, String] = {
    val grams = for {
      (id, t) <- rows if t != null && t.length >= L
      p <- 0 to t.length - L
    } yield (t.substring(p, p + L), id, p)
    val own = grams.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).min }
    rows.map { case (id, t) =>
      val cov =
        if (t == null || t.length < L) Set.empty[Int]
        else grams.collect { case (g, `id`, p) if own(g) < id => p }
          .flatMap(p => p until p + L).toSet
      id -> (if (t == null) null
             else t.zipWithIndex.collect { case (c, i) if !cov(i) => c }.mkString)
    }.toMap
  }

  private def runRemove(rows: Seq[(Long, String)], L: Int, w: Int): Map[Long, String] = {
    val s = spark
    import s.implicits._
    Dedup.removeSharedSpans(rows.toDF("doc_id", "text"), minLen = L, gramWidth = w)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  "removeSharedSpans" should "cut exactly the covered characters, keeping the lowest doc's copy" in {
    val rows = Seq(
      0L -> "0123456789abcdefghij", // owner of the run
      1L -> "xx0123456789abcdefghijyy", // run spliced mid-doc: cut to xxyy
      2L -> "zz", // shorter than minLen: untouched
      3L -> "a completely unique document with nothing shared at all",
      4L -> "0123456789ab") // prefix of the run, >= minLen: fully covered
    val got = runRemove(rows, L = 8, w = 4)
    got shouldBe bruteRemove(rows, 8)
    got(0L) shouldBe rows(0)._2 // owner untouched
    got(1L) shouldBe "xxyy" // interval-merged overlapping grams
    got(2L) shouldBe "zz"
    got(4L) shouldBe "" // all-covered doc survives as empty string
  }

  it should "match the all-offsets reference on a seeded corpus with spliced duplications" in {
    val rnd = new Random(42)
    def txt(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val base = (0L until 20L).map(i => i -> txt(60 + rnd.nextInt(80)))
    // splice spans of earlier docs into later ones (the dup mechanism);
    // some splices overlap, some docs get several
    val rows = base.map { case (id, t) =>
      if (id >= 10L && rnd.nextBoolean()) {
        val (srcId, src) = base(rnd.nextInt(id.toInt / 2))
        val span = src.substring(0, 15 + rnd.nextInt(20))
        val cut = rnd.nextInt(t.length)
        (id, t.substring(0, cut) + span + t.substring(cut), srcId)
      } else (id, t, -1L)
    }.map { case (id, t, _) => id -> t }
    runRemove(rows, L = 12, w = 8) shouldBe bruteRemove(rows, 12)
  }
}
