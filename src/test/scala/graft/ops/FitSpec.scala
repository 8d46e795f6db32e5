package graft.ops

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** [[Fit.ridgeNormal]] — sufficient-statistics ridge. The claims under
  * test: exact recovery of a noiseless linear law at λ=0, bit-identical
  * weights under repartitioning (long moments have no sum order), NULL
  * exclusion, and the d>2 Gaussian-elimination path. */
class FitSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def mkDf(rows: Seq[(Long, Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "x1", "x2", "y")
  }

  "Fit.ridgeNormal" should "recover a noiseless linear law exactly at lambda = 0" in {
    // y = 7 + 3·x1 − 2·x2, integer-valued everywhere
    val rows = for {
      x1 <- 0L to 12L; x2 <- 0L to 7L
    } yield (x1 * 100 + x2, x1, x2, 7L + 3 * x1 - 2 * x2)
    val (n, w) = Fit.ridgeNormal(mkDf(rows), Seq("x1", "x2"), "y", lambda = 0.0)
    n shouldBe rows.size.toLong
    w(0) shouldBe 7.0 +- 1e-9
    w(1) shouldBe 3.0 +- 1e-9
    w(2) shouldBe -2.0 +- 1e-9
  }

  it should "produce bit-identical weights under any partitioning" in {
    val rnd = new scala.util.Random(3)
    val rows = Seq.tabulate(500)(i => (i.toLong, rnd.nextInt(1000).toLong,
      rnd.nextInt(200).toLong, rnd.nextInt(1000000).toLong))
    val (n1, w1) = Fit.ridgeNormal(mkDf(rows), Seq("x1", "x2"), "y")
    val (n13, w13) = Fit.ridgeNormal(mkDf(rows).repartition(13), Seq("x1", "x2"), "y")
    n13 shouldBe n1
    w13.toSeq shouldBe w1.toSeq // exact long moments → exact same doubles
  }

  it should "exclude rows with NULL features or label" in {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val base = mkDf(Seq((1L, 2L, 3L, 10L), (2L, 4L, 1L, 20L), (3L, 1L, 1L, 5L)))
    val withNull = base.unionByName(
      Seq((4L, 9L)).toDF("id", "x1")
        .withColumn("x2", lit(null).cast("long"))
        .withColumn("y", lit(null).cast("long")))
    val (n, w) = Fit.ridgeNormal(withNull, Seq("x1", "x2"), "y")
    n shouldBe 3L
    val (_, wBase) = Fit.ridgeNormal(base, Seq("x1", "x2"), "y")
    w.toSeq shouldBe wBase.toSeq
  }

  it should "solve d > 2 features through Gaussian elimination" in {
    // y = 1 + 2·x1 + 3·x2 − x3 over a spanning integer grid
    val s = spark
    import s.implicits._
    val rows = for {
      x1 <- 0L to 5L; x2 <- 0L to 4L; x3 <- 0L to 3L
    } yield (x1, x2, x3, 1L + 2 * x1 + 3 * x2 - x3)
    val df = rows.toDF("x1", "x2", "x3", "y")
    val (_, w) = Fit.ridgeNormal(df, Seq("x1", "x2", "x3"), "y", lambda = 0.0)
    w(0) shouldBe 1.0 +- 1e-9
    w(1) shouldBe 2.0 +- 1e-9
    w(2) shouldBe 3.0 +- 1e-9
    w(3) shouldBe -1.0 +- 1e-9
  }

  "Fit.ridgePerGroupD2" should "match ridgeNormal group by group, fully in Columns" in {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(11)
    val rows = for {
      g <- Seq("a", "b", "c"); i <- 0 until 120
    } yield (g, rnd.nextInt(500).toLong, rnd.nextInt(90).toLong,
      rnd.nextInt(100000).toLong + i)
    val df = rows.toDF("src", "x1", "x2", "y")
    val got = Fit.ridgePerGroupD2(df, "src", "x1", "x2", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    Seq("a", "b", "c").foreach { g =>
      val (n, w) = Fit.ridgeNormal(df.where(col("src") === g),
        Seq("x1", "x2"), "y")
      got(g)._1 shouldBe n
      // both paths run the SAME det3 association over the SAME exact
      // moments — bit-identical, not just approximately equal
      got(g)._2 shouldBe w(0)
      got(g)._3 shouldBe w(1)
      got(g)._4 shouldBe w(2)
    }
    // shape: one hash aggregate + projection, no window, no join
    val plan = Fit.ridgePerGroupD2(df, "src", "x1", "x2", "y")
      .queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should not include "Join"
  }

  "Fit.predict" should "apply the weights as a pure projection" in {
    val df = mkDf(Seq((1L, 2L, 3L, 0L)))
    val out = Fit.predict(df, Seq("x1", "x2"), Array(1.0, 10.0, 100.0))
    out.select("prediction").head().getDouble(0) shouldBe 321.0 +- 1e-12
    // no exchange: a map-side projection over the input
    out.queryExecution.executedPlan.toString should not include "Exchange"
  }

  "Fit.looInfluenceD2" should "equal an actual N-refit leave-one-out, rank a planted outlier first, and stay map-side" in {
    val rnd = new scala.util.Random(41)
    val clean = (0L until 40L).map { i =>
      val x1 = rnd.nextInt(50).toLong + 1
      val x2 = rnd.nextInt(30).toLong + 1
      (i, x1, x2, 5000 + 300 * x1 - 70 * x2 + rnd.nextInt(40).toLong)
    }
    // plant one grossly mislabeled row
    val rows = clean :+ (99L, 25L, 15L, 10000000L)
    val df = mkDf(rows)
    val got = Fit.looInfluenceD2(df, "id", "x1", "x2", "y")
      .collect().map(r =>
        r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    got.size shouldBe rows.size
    // the Sherman–Morrison shortcut against the ground truth: refit
    // WITHOUT row i, and the refit model's residual on row i must equal
    // loo_resid — the claim that makes e/(1−h) "leave-one-out"
    rows.take(8).foreach { case (id, x1, x2, y) =>
      val (_, wRefit) = Fit.ridgeNormal(
        mkDf(rows.filterNot(_._1 == id)), Seq("x1", "x2"), "y")
      val refitResid = y.toDouble - (wRefit(0) + wRefit(1) * x1 + wRefit(2) * x2)
      got(id)._3 shouldBe refitResid +- (math.abs(refitResid) * 1e-6 + 1e-6)
    }
    // leverage is a valid ridge leverage: in (0, 1) for every row
    got.values.foreach { case (_, h, _) =>
      h should be > 0.0
      h should be < 1.0
    }
    // the planted outlier dominates the influence ranking
    got.maxBy { case (_, (_, _, loo)) => math.abs(loo) }._1 shouldBe 99L
    // NULL rows are excluded, and scoring adds no exchange beyond the
    // one training aggregate (the scored output is a pure projection)
    val s = spark
    import s.implicits._
    val withNull = Seq((1L, Some(2L), 3L, 4L), (2L, None, 5L, 6L),
      (3L, Some(7L), 8L, 9L)).toDF("id", "x1", "x2", "y")
    Fit.looInfluenceD2(withNull, "id", "x1", "x2", "y")
      .collect().map(_.getLong(0)).sorted shouldBe Array(1L, 3L)
    val plan = Fit.looInfluenceD2(df, "id", "x1", "x2", "y")
      .queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should not include "Join"
  }

  "Fit.cvRidgeD2" should "train each fold's model on exactly the complement and score held-out exactly" in {
    val rnd = new scala.util.Random(43)
    val rows = (0L until 120L).map { i =>
      val x1 = rnd.nextInt(80).toLong + 1
      val x2 = rnd.nextInt(40).toLong + 1
      (i, x1, x2, 2000 + 41 * x1 + 13 * x2 + rnd.nextInt(25).toLong)
    }
    val df = mkDf(rows)
    val cv = Fit.cvRidgeD2(df, "id", "x1", "x2", "y", k = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5), r.getLong(6))).toMap
    cv.keySet shouldBe Set(0L, 1L, 2L, 3L)
    // folds partition the rows
    cv.values.map(_._5).sum shouldBe rows.size.toLong
    cv.foreach { case (_, (nTrain, _, _, _, nTest, _)) =>
      nTrain + nTest shouldBe rows.size.toLong
    }
    // ground truth: recompute each row's fold by the same hash rule,
    // refit on the complement via ridgeNormal (bit-identical claim), and
    // re-derive the integer-residual SSE
    def foldOf(id: Long): Long = {
      val h = graft.pipeline.Hashing.hash60(s"$id#cv")
      ((h % 4) + 4) % 4
    }
    (0L until 4L).foreach { f =>
      val test = rows.filter(r => foldOf(r._1) == f)
      val train = rows.filterNot(r => foldOf(r._1) == f)
      val (nRefit, wRefit) = Fit.ridgeNormal(mkDf(train), Seq("x1", "x2"), "y")
      val (nTrain, w0, w1, w2, nTest, sse) = cv(f)
      nTrain shouldBe nRefit
      nTest shouldBe test.size.toLong
      // same exact moments (subtraction vs direct) + same Cramer
      // association → same doubles? NOT guaranteed: cvRidgeD2 subtracts
      // then solves in Columns while ridgeNormal aggregates directly —
      // the MOMENTS are identical exact longs either way, and both run
      // det3's association, so the weights ARE bit-identical
      w0 shouldBe wRefit(0)
      w1 shouldBe wRefit(1)
      w2 shouldBe wRefit(2)
      val expectSse = test.map { case (_, x1, x2, y) =>
        val r = math.floor(
          y.toDouble - (w0 + w1 * x1.toDouble + w2 * x2.toDouble) + 0.5).toLong
        r * r
      }.sum
      sse shouldBe expectSse
    }
    // partition invariance: exact moments + hash folds have no order
    val again = Fit.cvRidgeD2(mkDf(rows).repartition(7), "id", "x1", "x2", "y",
      k = 4).collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5), r.getLong(6))).toMap
    again shouldBe cv
  }

  "Fit.calibrationD2" should "bin by prediction with the ±1 depth law and track a calibrated fixture" in {
    val rnd = new scala.util.Random(53)
    val rows = (0L until 400L).map { i =>
      val x1 = rnd.nextInt(100).toLong + 1
      val x2 = rnd.nextInt(60).toLong + 1
      // exact linear law + symmetric noise: calibrated by construction
      (i, x1, x2, 10000 + 50 * x1 + 20 * x2 + (rnd.nextInt(401) - 200).toLong)
    }
    val df = mkDf(rows)
    val got = Fit.calibrationD2(df, "id", "x1", "x2", "y", nBuckets = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    got.keySet shouldBe (0L until 10L).toSet
    // equal-depth ±1 law and full coverage
    got.values.map(_._1).sum shouldBe 400L
    got.values.foreach { case (n, _, _, _, _) => n shouldBe 40L +- 1L }
    // prediction means ascend across buckets (ranked by prediction)
    val mp = (0L until 10L).map(b => got(b)._4)
    mp.sliding(2).foreach(p => p(0) should be <= p(1))
    // calibrated fixture: per-bucket actual tracks predicted within the
    // noise scale (sd 116, se at n=40 ≈ 18 → 4σ ≈ 73)
    got.values.foreach { case (_, _, _, predM, actM) =>
      math.abs(predM - actM) should be < 150.0
    }
    // partition invariance (exact rank + long sums)
    Fit.calibrationD2(df.repartition(7), "id", "x1", "x2", "y", nBuckets = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap shouldBe got
  }

  "Fit.conformalD2" should "hit the finite-sample coverage guarantee and match a hand replay" in {
    val rnd = new scala.util.Random(59)
    val rows = (0L until 1200L).map { i =>
      val x1 = rnd.nextInt(100).toLong + 1
      val x2 = rnd.nextInt(50).toLong + 1
      (i, x1, x2, 5000 + 30 * x1 + 12 * x2 + (rnd.nextInt(201) - 100).toLong)
    }
    val df = mkDf(rows)
    val out = Fit.conformalD2(df, "id", "x1", "x2", "y").head()
    val (nFit, nCal, nTest, q, nCov) = (out.getLong(0), out.getLong(1),
      out.getLong(2), out.getLong(3), out.getLong(4))
    nFit + nCal + nTest shouldBe rows.size.toLong
    // the ≥ 1−α finite-sample guarantee, with binomial slack at n_test
    val coverage = nCov.toDouble / nTest
    coverage should be >= 0.85
    // and non-trivial: q is not swallowing everything
    coverage should be <= 0.99
    q should be > 0L
    q should be < 300L // noise is ±100 → quantile of |resid| well under 300
    // hand replay: same split hash, refit on fit slice, nearest-rank on
    // the (score, hash, id) order, coverage recount
    def splitOf(id: Long): String = {
      val h = graft.pipeline.Hashing.hash60(s"$id#conf")
      val thr = Sampling.cumThresholds(Seq(0.5, 0.25, 0.25))
      if (h < thr(0)) "fit" else if (h < thr(1)) "cal" else "test"
    }
    val fitRows = rows.filter(r => splitOf(r._1) == "fit")
    val (_, w) = Fit.ridgeNormal(mkDf(fitRows), Seq("x1", "x2"), "y")
    def score(r: (Long, Long, Long, Long)): Long = math.abs(math.floor(
      r._4.toDouble - (w(0) + w(1) * r._2.toDouble + w(2) * r._3.toDouble)
        + 0.5).toLong)
    val cal = rows.filter(r => splitOf(r._1) == "cal")
      .map(r => (score(r), graft.pipeline.Hashing.hash60(s"${r._1}#confr"), r._1))
      .sorted
    val k = math.min(cal.size.toLong, ((cal.size + 1) * 9 + 9) / 10)
    cal.size.toLong shouldBe nCal
    cal((k - 1).toInt)._1 shouldBe q
    val testRows = rows.filter(r => splitOf(r._1) == "test")
    testRows.size.toLong shouldBe nTest
    testRows.count(r => score(r) <= q).toLong shouldBe nCov
    // partition invariance
    Fit.conformalD2(df.repartition(7), "id", "x1", "x2", "y")
      .head().toSeq shouldBe out.toSeq
  }

  "Fit.conformalMondrianD2" should "calibrate each stratum by its own residual scale" in {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(67)
    // heteroscedastic strata: 'tight' ±40 noise, 'wide' ±400 — ONE shared
    // model, so a single marginal quantile must misfit one of them;
    // per-stratum quantiles must separate by an order of magnitude
    val rows = (0L until 1600L).map { i =>
      val x1 = rnd.nextInt(100).toLong + 1
      val x2 = rnd.nextInt(50).toLong + 1
      val tight = i % 2 == 0
      val noise = if (tight) rnd.nextInt(81) - 40 else rnd.nextInt(801) - 400
      (i, if (tight) "tight" else "wide", x1, x2,
        8000 + 25 * x1 + 10 * x2 + noise.toLong)
    }
    val df = rows.toDF("id", "src", "x1", "x2", "y")
    val got = Fit.conformalMondrianD2(df, "id", "src", "x1", "x2", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    got.keySet shouldBe Set("tight", "wide")
    val (_, qT, nTestT, covT) = got("tight")
    val (_, qW, nTestW, covW) = got("wide")
    // each stratum's quantile reflects ITS noise scale
    qT should be < 100L
    qW should be > 200L
    // and the guarantee holds per group (binomial slack at ~200 test rows)
    covT.toDouble / nTestT should be >= 0.82
    covW.toDouble / nTestW should be >= 0.82
    // determinism under repartitioning
    Fit.conformalMondrianD2(df.repartition(7), "id", "src", "x1", "x2", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap shouldBe got
  }

  "Fit.logisticElliottD2" should "separate a separable fixture and stay bit-identical under repartitioning" in {
    val rnd = new scala.util.Random(47)
    // linearly separable with margin: y = [x1 + x2 > 60]
    val rows = (0L until 200L).map { i =>
      val x1 = rnd.nextInt(50).toLong
      val x2 = rnd.nextInt(50).toLong
      val m = x1 + x2
      (i, x1, x2, if (m > 70) 1L else if (m < 50) 0L else -1L)
    }.filter(_._4 >= 0L)
    val df = mkDf(rows)
    val (n, w, nCorrect) = Fit.logisticElliottD2(df, "x1", "x2", "y", iters = 3)
    n shouldBe rows.size.toLong
    // with a 20-unit margin, 3 IRLS rounds classify the training set
    // (near-)perfectly — allow one boundary miss
    nCorrect.toDouble / n should be >= 0.99
    // the learned direction: both features push toward the label
    w(1) should be > 0.0
    w(2) should be > 0.0
    // quantized long moments + driver Cramer have no partition order
    val (n2, w2, c2) = Fit.logisticElliottD2(df.repartition(9),
      "x1", "x2", "y", iters = 3)
    n2 shouldBe n
    c2 shouldBe nCorrect
    w2.toSeq shouldBe w.toSeq
    // NULL labels/features excluded
    val s = spark
    import s.implicits._
    val withNull = Seq((1L, Some(2L), 3L, Some(1L)), (2L, None, 5L, Some(0L)),
      (3L, Some(7L), 8L, None), (4L, Some(1L), 1L, Some(0L)))
      .toDF("id", "x1", "x2", "y")
    val (n3, _, _) = Fit.logisticElliottD2(withNull, "x1", "x2", "y", iters = 1)
    n3 shouldBe 2L
  }
}
