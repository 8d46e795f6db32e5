package graft.ops

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions.col

import graft.pipeline.Hashing
import graft.tsne.SparkTestBase

/** [[Sampling.weightedSample]] — Gumbel-top-k weighted sampling without
  * replacement. The claims under test: bit-parity with a plain-Scala
  * reference of the quantized score, the exact cutoff count,
  * partitioning invariance, and that weights actually bias selection. */
class WeightedSampleSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def mkDf(rows: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "w")
  }

  private def refScore(id: Long, w: Long, salt: String): Long = {
    val lw = math.floor(math.log(w.toDouble) * 1e6 + 0.5).toLong
    val h = Hashing.hash60(id.toString + "#" + salt + "!g")
    val u = (h.toDouble + 0.5) / 1152921504606846976.0
    lw + math.floor(-math.log(-math.log(u)) * 1e6 + 0.5).toLong
  }

  "Sampling.weightedSample" should "match the plain-Scala score reference and the exact cutoff" in {
    val rows = (0L until 60L).map(i => (i, 1L + (i % 7) * 100L))
    val got = Sampling.weightedSample(mkDf(rows), "id", col("w"),
        keepNum = 1L, keepDen = 3L, salt = "t")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("score_u"),
        r.getAs[Long]("sample_rank")))
    got.length shouldBe 20 // ceil(60/3)
    val want = rows.map { case (id, w) => id -> refScore(id, w, "t") }.toMap
    got.foreach { case (id, sc, _) => sc shouldBe want(id) }
    // the kept set is exactly the top-20 by (score desc, tiebreak)
    val topIds = rows.map { case (id, w) =>
      (want(id), Hashing.hash60(id.toString + "#t"), id)
    }.sortBy { case (s, h, id) => (-s, h, id) }.take(20).map(_._3).toSet
    got.map(_._1).toSet shouldBe topIds
  }

  it should "be invariant to partitioning and bias selection toward heavy weights" in {
    // half the rows carry 1000x the weight (ln ratio ≈ 6.9e6 micro vs a
    // Gumbel spread of ~1.3e6) — the kept quarter should be almost
    // entirely heavy rows
    val rows = (0L until 200L).map(i => (i, if (i < 100) 1000L else 1L))
    val df = mkDf(rows)
    val a = Sampling.weightedSample(df, "id", col("w"), 1L, 4L, "b")
      .collect().map(_.getAs[Long]("id")).sorted
    val b = Sampling.weightedSample(df.repartition(13), "id", col("w"),
        1L, 4L, "b")
      .collect().map(_.getAs[Long]("id")).sorted
    a shouldBe b
    a.length shouldBe 50
    a.count(_ < 100L) should be >= 45
  }
}
