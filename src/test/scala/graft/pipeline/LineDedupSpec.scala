package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** Global line dedup: corpus-wide first-occurrence-wins (by (doc_id,
  * idx)), within-doc repeats count as occurrences too, rebuild preserves
  * line order, fully-deduped docs keep an empty row. */
class LineDedupSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def run(rows: (Long, String)*): Map[Long, (String, Long, Long)] = {
    val s = spark
    import s.implicits._
    Dedup.dedupLines(rows.toDF("doc_id", "text"))
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  "dedupLines" should "keep only the corpus-wide first occurrence" in {
    val got = run(
      1L -> "alpha\nbeta",
      2L -> "beta\ngamma", // beta first seen in doc 1
      3L -> "alpha\nbeta") // entirely duplicate
    got(1L) shouldBe (("alpha\nbeta", 2L, 0L))
    got(2L) shouldBe (("gamma", 1L, 1L))
    got(3L) shouldBe (("", 0L, 2L))
  }

  it should "dedupe within-doc repeats and preserve line order" in {
    val got = run(1L -> "x\ny\nx\nz")
    got(1L) shouldBe (("x\ny\nz", 3L, 1L))
  }

  it should "break first-occurrence ties by doc then index" in {
    // 'dup' appears at (1, 1) and (2, 0): doc 1 wins despite the
    // larger index — packed key orders by doc_id first
    val got = run(1L -> "a\ndup", 2L -> "dup\nb")
    got(1L) shouldBe (("a\ndup", 2L, 0L))
    got(2L) shouldBe (("b", 1L, 1L))
  }
}
