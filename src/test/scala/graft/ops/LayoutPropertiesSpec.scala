package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

import scala.util.Random

/** Property-style tests for the deterministic layout operators (shard
  * assignment, sequence packing, token budgets) — invariants that must
  * hold for ANY input, complementing OpsSpec's example-based checks.
  * Seeded explicit sampling, like KernelPropertiesSpec (no
  * scalatest↔scalacheck bridge in the offline cache). Spark jobs are a
  * few hundred ms each, so cases per property stay single-digit with
  * randomized sizes, degenerate shapes included.
  */
class LayoutPropertiesSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private val rnd = new Random(20260813L)

  "assignShards" should "emit a bijective rank matching the salted sort, for any size and partitioning" in {
    val s = spark
    import s.implicits._
    // sizes include the degenerate shapes: empty, single row, N < shardSize
    for (n <- Seq(0, 1, 3, rnd.nextInt(500) + 2, rnd.nextInt(5000) + 100)) {
      val shardSize = 1L + rnd.nextInt(40)
      val p = 1 + rnd.nextInt(12)
      val salt = s"s${rnd.nextInt(1000)}"
      val df = s.range(n.toLong).toDF("id")
      val got = Sharding.assignShards(df, "id", shardSize, salt, partitions = p)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      got.length shouldBe n
      // ranks shard*size+pos are exactly 0..N-1 (bijection, no gaps/dups)
      got.map { case (_, sh, pos) => sh * shardSize + pos }.sorted shouldBe
        (0L until n.toLong).toArray
      // and they agree with the locally computed salted order
      val order = df.withColumn("h", graft.pipeline.Hashing.hash60(
          concat(col("id").cast("string"), lit("#" + salt))))
        .collect().map(r => (r.getLong(1), r.getLong(0)))
        .sortBy(identity).map(_._2)
      val byRank = got.sortBy { case (_, sh, pos) => sh * shardSize + pos }
        .map(_._1)
      byRank shouldBe order
    }
  }

  "packSequences" should "tile the token stream with no gaps or overlaps, for any input" in {
    val s = spark
    import s.implicits._
    for (n <- Seq(0, 1, rnd.nextInt(400) + 2, rnd.nextInt(3000) + 50)) {
      val seqLen = 1L + rnd.nextInt(200) // includes seqLen = 1
      val p = 1 + rnd.nextInt(9)
      val salt = s"p${rnd.nextInt(1000)}"
      // token counts include zeros (dropped) and values larger than seqLen
      // (docs spanning several sequences)
      val df = s.range(n.toLong)
        .select(col("id"), (pmod(col("id") * 2654435761L, lit(37))).as("toks"))
      val got = Packing.packSequences(df, "id", "toks", seqLen, salt, p)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      val totalToks = df.where(col("toks") > 0)
        .agg(coalesce(sum("toks"), lit(0L))).collect()(0).getLong(0)
      // tiling: in start order, each doc begins where the previous ended
      val inOrder = got.sortBy(_._3)
      inOrder.foldLeft(0L) { case (expectStart, (_, toks, start, _, _, _)) =>
        start shouldBe expectStart
        expectStart + toks
      } shouldBe totalToks
      // derived columns are consistent with the definition
      inOrder.foreach { case (_, toks, start, sf, sl, pos) =>
        sf shouldBe start / seqLen
        sl shouldBe (start + toks - 1) / seqLen
        pos shouldBe start % seqLen
        sl should be >= sf
      }
    }
  }

  "tokenBudgetSample" should "keep exactly the greedy hash-ordered prefix, for any budgets" in {
    val s = spark
    import s.implicits._
    for (_ <- 1 to 3) {
      val n = rnd.nextInt(2000) + 10
      val strata = 1 + rnd.nextInt(5)
      val salt = s"b${rnd.nextInt(1000)}"
      val budgets = (0 until strata)
        .map(g => g.toString -> rnd.nextInt(800).toLong).toMap
      val df = s.range(n.toLong)
        .select(col("id"), (col("id") % strata).cast("string").as("g"),
          (pmod(col("id") * 40503L, lit(13)) + 1).as("toks"))
      val got = Sampling.tokenBudgetSample(df, "id", "g", col("toks"),
        budgets, salt)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3)))
      val all = df.withColumn("h", graft.pipeline.Hashing.hash60(
          concat(col("id").cast("string"), lit("#" + salt))))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3)))
      budgets.foreach { case (g, budget) =>
        var cum = 0L
        val expect = all.filter(_._2 == g).sortBy(t => (t._4, t._1))
          .takeWhile { t => cum += t._3; cum <= budget }.map(_._1).toSet
        got.filter(_._2 == g).map(_._1).toSet shouldBe expect
      }
      // every kept row's running total respects its stratum budget
      got.foreach { case (_, g, _, cumTok) =>
        cumTok should be <= budgets(g)
      }
    }
  }
}
