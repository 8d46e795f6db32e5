package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** Winsorization, min-max scaling, the equi-depth histogram and grouped
  * OLS trends against hand-computed fixtures. */
class NormalizeSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private lazy val s = spark

  behavior of "Normalize.winsorizePerStratum"

  it should "clamp to the exact nearest-rank cutoffs per stratum" in {
    import s.implicits._
    // stratum a: values 1..10 → p20 cutoff = ceil(10·1/5)=rank 2 → 2,
    //            p80 cutoff = ceil(10·4/5)=rank 8 → 8
    val df = (1 to 10).map(i => (i.toLong, "a", i.toDouble))
      .toDF("id", "g", "v")
    val got = Normalize.winsorizePerStratum(df, "id", "g", "v",
      loQ = (1L, 5L), hiQ = (4L, 5L))
      .orderBy("id")
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    got.map(_._1) shouldBe (1 to 10).map(_.toDouble)
    got.map(_._2) shouldBe Seq(2.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 8.0, 8.0)
  }

  it should "keep NULL values NULL and isolate strata" in {
    import s.implicits._
    val df = Seq(
      (1L, "a", Some(1.0)), (2L, "a", Some(100.0)), (3L, "a", None),
      (4L, "b", Some(-50.0)), (5L, "b", Some(50.0)))
      .toDF("id", "g", "v")
    val got = Normalize.winsorizePerStratum(df, "id", "g", "v",
      loQ = (1L, 2L), hiQ = (1L, 1L))
      .orderBy("id")
      .collect().map(r => Option(r.get(3)).map(_.asInstanceOf[Double]))
    // a: lo = rank ceil(2·1/2)=1 → 1.0, hi = rank 2 → 100.0
    // b: lo = rank 1 → -50.0, hi = rank 2 → 50.0 — never a's cutoffs
    got shouldBe Seq(Some(1.0), Some(100.0), None, Some(-50.0), Some(50.0))
  }

  behavior of "Normalize.minMaxScalePerStratum"

  it should "scale to [0,1] per stratum with degenerate strata at 0" in {
    import s.implicits._
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 7L), (5L, "b", 7L))
      .toDF("id", "g", "v")
    val got = Normalize.minMaxScalePerStratum(df, "g", "v")
      .orderBy("id")
      .collect().map(_.getDouble(3))
    got shouldBe Seq(0.0, 0.5, 1.0, 0.0, 0.0)
  }

  behavior of "Analytics.equiDepthHistogram"

  it should "give equal-count buckets (±1) with true boundaries" in {
    import s.implicits._
    val df = (1 to 103).map(i => (i.toLong, (104 - i).toLong))
      .toDF("id", "v")
    val got = Analytics.equiDepthHistogram(df, "id", "v", nBuckets = 4)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.map(_._1) shouldBe Seq(0L, 1L, 2L, 3L)
    // 103 rows over 4 buckets: sizes 26/26/26/25 by the rank·nB div N rule
    got.map(_._2).sum shouldBe 103L
    got.map(_._2).max - got.map(_._2).min should be <= 1L
    // buckets tile the value range in order without overlap
    got.sliding(2).foreach { case Array(a, b) => a._4 should be < b._3 }
    got.head._3 shouldBe 1L
    got.last._4 shouldBe 103L
  }

  it should "be invariant to input partitioning" in {
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (1 to 500).map(i => (i.toLong, rnd.nextInt(40).toLong))
    def run(parts: Int) =
      Analytics.equiDepthHistogram(
        rows.toDF("id", "v").repartition(parts), "id", "v", 8)
        .orderBy("bucket")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    run(1) shouldBe run(17)
  }

  behavior of "Analytics.olsTrendPerGroup"

  it should "recover an exact linear relation and NULL out zero variance" in {
    import s.implicits._
    // group a: y = 3x + 2 exactly; group b: constant x → undefined slope
    val df = (Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"))
      .map { case (x, g) => (g, x, 3 * x + 2) } ++
      Seq(("b", 5L, 1L), ("b", 5L, 9L)))
      .toDF("g", "x", "y")
    val got = Analytics.olsTrendPerGroup(df, "g", "x", "y")
      .orderBy("g").collect()
    got(0).getLong(1) shouldBe 4L
    got(0).getDouble(2) shouldBe 3.0
    got(0).getDouble(3) shouldBe 2.0
    got(1).isNullAt(2) shouldBe true
    got(1).isNullAt(3) shouldBe true
  }

  it should "match a double-precision reference fit on noisy data" in {
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val pts = (1 to 300).map { _ =>
      val x = rnd.nextInt(500).toLong
      (x, 2 * x + rnd.nextInt(100).toLong)
    }
    val df = pts.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val r = Analytics.olsTrendPerGroup(df, "g", "x", "y").collect().head
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum.toDouble
    val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r.getDouble(2) shouldBe slope +- 1e-6
  }

  behavior of "Analytics.ksDriftPerStratum"

  private def bruteKs(rows: Seq[(Long, String, Long)]): Map[String, (Long, Long, Long)] = {
    // (stratum -> (n_in, n_out, ks_num)) by direct CDF evaluation
    rows.map(_._2).distinct.map { g =>
      val in = rows.filter(_._2 == g).map(_._3)
      val out = rows.filter(_._2 != g).map(_._3)
      val grid = (in ++ out).distinct
      val num = grid.map(x =>
        math.abs(in.count(_ <= x).toLong * out.size -
          out.count(_ <= x).toLong * in.size)).max
      g -> (in.size.toLong, out.size.toLong, num)
    }.toMap
  }

  it should "match the direct CDF evaluation, at any partitioning" in {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    // stratum "b" shifted by +50: a real drift the monitor must see
    val rows = (0 until 300).map { i =>
      val g = if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"
      val v = rnd.nextInt(100).toLong + (if (g == "b") 50L else 0L)
      (i.toLong, g, v)
    }
    val expect = bruteKs(rows)
    def got(parts: Int) = Analytics.ksDriftPerStratum(
      rows.toDF("id", "src", "v").repartition(parts), "id", "src", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    got(1) shouldBe expect
    got(7) shouldBe expect
    // and the drifted stratum's statistic dominates
    val ks = expect.map { case (g, (ni, no, num)) =>
      g -> num.toDouble / (ni * no) }
    ks("b") should be > ks("a")
    ks("b") should be > 0.4
  }

  it should "handle ties, nulls and a single-stratum input" in {
    val s = spark
    import s.implicits._
    // heavy ties: values only 1 and 2
    val rows = Seq((1L, "a", 1L), (2L, "a", 1L), (3L, "a", 2L),
      (4L, "b", 1L), (5L, "b", 2L), (6L, "b", 2L))
    val expect = bruteKs(rows)
    Analytics.ksDriftPerStratum(rows.toDF("id", "src", "v"), "id", "src", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap shouldBe expect
    // NULL values drop; a lone stratum has an empty other side -> ks 0
    val df = Seq((1L, Some(1L)), (2L, None), (3L, Some(5L)))
      .toDF("id", "v").withColumn("src", lit("only"))
    val r = Analytics.ksDriftPerStratum(df, "id", "src", "v").head
    r.getLong(1) shouldBe 2L
    r.getLong(2) shouldBe 0L
    r.getDouble(4) shouldBe 0.0
  }

  behavior of "Normalize.quantileNormalizePerStratum"

  /** Plain-Scala replay: per-stratum rank and global rank in the exact
    * (value, hash, key) tie order, ceil-div mapping, global value fetch. */
  private def bruteQn(rows: Seq[(Long, String, Long)],
                      salt: String): Map[Long, (Long, Long)] = {
    val n = rows.size.toLong
    def h(id: Long) = graft.pipeline.Hashing.hash60(s"$id#$salt")
    val gval = rows.sortBy { case (id, _, v) => (v, h(id), id) }.map(_._3)
    rows.groupBy(_._2).flatMap { case (_, grp) =>
      val ns = grp.size.toLong
      grp.sortBy { case (id, _, v) => (v, h(id), id) }.zipWithIndex.map {
        case ((id, _, _), i) =>
          val rs = i + 1L
          val tgt = (rs * n + ns - 1L) / ns
          id -> (rs, gval((tgt - 1L).toInt))
      }
    }.toMap
  }

  private def runQn(rows: Seq[(Long, String, Long)], salt: String,
                    parts: Int = 4): Map[Long, (Long, Long)] = {
    val s = spark
    import s.implicits._
    Normalize.quantileNormalizePerStratum(
        rows.toDF("id", "src", "v").repartition(parts), "id", "src", "v",
        salt = salt)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("stratum_rank"), r.getAs[Long]("v_norm"))).toMap
  }

  it should "match the replay on skewed strata and make every marginal the global one" in {
    val rnd = new scala.util.Random(17)
    // three sources on wildly different scales — the transform's point
    val rows = (1L to 60L).map(i => (i, "a", 10L + rnd.nextInt(20))) ++
      (61L to 100L).map(i => (i, "b", 1000L + rnd.nextInt(5000))) ++
      (101L to 110L).map(i => (i, "c", rnd.nextInt(3).toLong))
    val got = runQn(rows, "qtest")
    got shouldBe bruteQn(rows, "qtest")
    // normalized values are actual global values
    val gvals = rows.map(_._3).toSet
    got.values.map(_._2).toSet.subsetOf(gvals) shouldBe true
    // rs = ns maps to tgt = N exactly, so every stratum's top-ranked row
    // lands on the global maximum
    val sizes = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val stratumOf = rows.map(r => r._1 -> r._2).toMap
    val tops = got.collect { case (id, (rs, nv))
      if rs == sizes(stratumOf(id)) => nv }
    tops.toSet shouldBe Set(rows.map(_._3).max)
  }

  it should "be the identity on a single-stratum input and partition-invariant" in {
    val rnd = new scala.util.Random(3)
    val rows = (1L to 50L).map(i => (i, "only", rnd.nextInt(100).toLong))
    val got = runQn(rows, "qid")
    // one stratum: rs = gr exactly, so each row maps to its own value's
    // position — the value multiset is preserved row-for-row
    val byId = rows.map(r => r._1 -> r._3).toMap
    // replay gives the identity on values
    got.map { case (id, (_, nv)) => nv } should contain theSameElementsAs
      rows.map(_._3)
    got shouldBe bruteQn(rows, "qid")
    runQn(rows, "qid", parts = 1) shouldBe runQn(rows, "qid", parts = 13)
    byId.size shouldBe 50
  }
}
