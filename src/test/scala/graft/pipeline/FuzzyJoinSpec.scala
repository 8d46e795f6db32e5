package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.tsne.SparkTestBase

import scala.util.Random

/** [[FuzzyJoin.editDistanceJoin]] — the Ed-Join prefix filter is claimed
  * LOSSLESS; every test here checks the join's pair set against an
  * independent all-pairs levenshtein computed in plain Scala. */
class FuzzyJoinSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  /** Textbook O(mn) DP — the test-side truth, independent of both the
    * operator and Spark's levenshtein. */
  private def lev(a: String, b: String): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  private def bruteforce(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] =
    (for {
      (i, a) <- rows; (j, b) <- rows if i < j
      dist = lev(a, b) if dist <= d
    } yield (i, j, dist.toLong)).toSet

  private def run(rows: Seq[(Long, String)], d: Int, q: Int = 4): Set[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    FuzzyJoin.editDistanceJoin(rows.toDF("doc_id", "key"), "doc_id", "key", d, q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  "editDistanceJoin" should "find hand-checkable pairs with exact distances" in {
    val rows = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumped over the lazy dog",  // 2 edits vs 1
      3L -> "the quick brown cat jumps over the lazy dog",   // 3 subs vs 1; 5 vs 2
      4L -> "completely different sentence about spark plans here")
    val got = run(rows, d = 4)
    got.map(t => (t._1, t._2)) shouldBe Set((1L, 2L), (1L, 3L))
    got shouldBe bruteforce(rows, 4)
  }

  it should "match all-pairs levenshtein on a mutated corpus (lossless filters)" in {
    val rnd = new Random(7)
    val alpha = "abcdefgh "
    def randStr(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    def mutate(s: String, edits: Int): String = {
      var cur = s
      for (_ <- 1 to edits) {
        val p = rnd.nextInt(math.max(1, cur.length))
        cur = rnd.nextInt(3) match {
          case 0 if cur.nonEmpty => cur.patch(p, "", 1)                       // delete
          case 1 => cur.patch(p, alpha(rnd.nextInt(alpha.length)).toString, 0) // insert
          case _ if cur.nonEmpty => cur.patch(p, alpha(rnd.nextInt(alpha.length)).toString, 1)
          case _ => cur
        }
      }
      cur
    }
    // 40 base strings, each with 0-3 mutated twins at 0-6 edits — plenty of
    // pairs inside AND outside the threshold, plus duplicate-gram strings
    val rows = Random.shuffle {
      var id = 0L
      (1 to 40).flatMap { _ =>
        val base = randStr(30 + rnd.nextInt(40))
        (0 to rnd.nextInt(3)).map { _ =>
          id += 1; id -> (if (id % 3 == 0) base else mutate(base, rnd.nextInt(7)))
        }
      }
    }
    run(rows, d = 4) shouldBe bruteforce(rows, 4)
  }

  it should "route short keys through the dense path without loss" in {
    // q*(d+1) = 8 with q=4, d=1: keys under 8 chars can't carry the prefix
    // theorem. Mix short-short, short-long (across the length boundary) and
    // long-long pairs.
    val rows = Seq(
      1L -> "cat", 2L -> "cap", 3L -> "cats",       // short cluster
      4L -> "catapult", 5L -> "catapults",          // long cluster
      6L -> "catapul",                              // short, 1 edit from long 4
      7L -> "zebra")
    run(rows, d = 1, q = 4) shouldBe bruteforce(rows, 1)
  }

  it should "handle empty and null keys and d=0 (exact match) exactly" in {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "same"), (2L, "same"), (3L, ""), (4L, ""), (5L, "diff"))
      .toDF("doc_id", "key")
      .unionByName(Seq(6L).toDF("doc_id").withColumn("key", lit(null).cast("string")))
    val got = FuzzyJoin.editDistanceJoin(df, "doc_id", "key", maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe Set((1L, 2L, 0L), (3L, 4L, 0L))
  }

  it should "stay exact when every doc shares one hot gram (skew)" in {
    // every key embeds the same 8-char run — under a frequency-ascending
    // order the hot grams fall OUT of the q*d+1 prefix, and the pair set
    // must still be complete via the rare grams
    val rnd = new Random(11)
    def tail(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    val rows = (1L to 30L).map { i =>
      val t = tail(20)
      i -> (s"commonrun$t" + (if (i % 2 == 0) "x" else ""))
    }
    run(rows, d = 2) shouldBe bruteforce(rows, 2)
  }
}
