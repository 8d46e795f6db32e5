package graft.tsne

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Ports the reference's optimizer-stage tests
  * (ref `TsneHelpersTestSuite.scala:139-166` centering, `:211-231` init,
  * `:273-327` one full iteration superstep, tol 1e-9), plus rebuild-specific
  * checks: the 3-phase schedule arithmetic, seeded-init determinism, and
  * local-vs-distributed path equivalence (the reference has a single path;
  * the rebuild's two must agree).
  */
class OptimizerSpec extends AnyFlatSpec with Matchers with org.scalatest.Inspectors with SparkTestBase {

  private def toRows(p: Seq[(Long, Long, Double)]): Array[AffinityRow] =
    p.groupBy(_._1).toSeq.sortBy(_._1).map { case (i, rows) =>
      val sorted = rows.sortBy(_._2)
      AffinityRow(i, sorted.map(_._2).toArray, sorted.map(_._3).toArray)
    }.toArray

  private val superstepParams = Optimizer.Params(
    iterations = 1, initialMomentum = 0.5, earlyExaggeration = 1.0,
    learningRate = 300, theta = 0.0, minGain = 0.01)

  "optimizeLocal" should "reproduce one reference superstep (gradient+update+center)" in {
    val ws0 = Goldens.initialEmbedding.map(p =>
      WorkingSet(p.id, p.vec.clone(), Array(0.0, 0.0), Array(1.0, 1.0)))
    val (points, _) = Optimizer.optimizeLocal(
      toRows(Goldens.denseJointProbabilities), ws0.toArray, superstepParams)
    val expected = Goldens.updatedAndCentredEmbedding.map(p => p.id -> p.vec).toMap
    points.length shouldBe expected.size
    for (p <- points; d <- 0 until 2) {
      withClue(s"y(${p.id})($d): ") { p.vec(d) shouldBe expected(p.id)(d) +- 1e-9 }
    }
  }

  "optimizeDistributed" should "match the local path on the same input" in {
    val s = spark
    import s.implicits._
    val pRows = toRows(Goldens.denseJointProbabilities)
    val ws0 = Goldens.initialEmbedding.map(p =>
      WorkingSet(p.id, p.vec.clone(), Array(0.0, 0.0), Array(1.0, 1.0)))

    val params = superstepParams.copy(iterations = 25)
    val (localPoints, localLoss) = Optimizer.optimizeLocal(
      pRows.map(r => r.copy(js = r.js.clone(), ps = r.ps.clone())),
      ws0.map(w => w.copy(y = w.y.clone(), lastGrad = w.lastGrad.clone(),
        gains = w.gains.clone())).toArray,
      params)

    val acc = new MapAccumulator
    s.sparkContext.register(acc, "loss-test")
    val distPoints = Optimizer.optimizeDistributed(
      s.createDataset(pRows.toSeq), s.createDataset(ws0), params, Some(acc))
      .collect()

    val localMap = localPoints.map(p => p.id -> p.vec).toMap
    distPoints.length shouldBe localPoints.length
    for (p <- distPoints; d <- 0 until 2) {
      withClue(s"y(${p.id})($d): ") { p.vec(d) shouldBe localMap(p.id)(d) +- 1e-9 }
    }
    // loss side-channel: recorded at the same supersteps, same values —
    // the distributed loss is fused into the forces pass via the
    // sumQ-independent decomposition, so this also pins that identity
    acc.value.keySet shouldBe localLoss.keySet
    for ((k, v) <- localLoss) acc.value(k) shouldBe v +- 1e-9

    // executor-side tree build (treeAggregate subtree merge) agrees too
    val acc2 = new MapAccumulator
    s.sparkContext.register(acc2, "loss-test-rddtree")
    val distPoints2 = Optimizer.optimizeDistributed(
      s.createDataset(pRows.toSeq), s.createDataset(ws0),
      params.copy(distTreeMinPoints = 0), Some(acc2)).collect()
    for (p <- distPoints2; d <- 0 until 2) {
      withClue(s"rdd-tree y(${p.id})($d): ") {
        p.vec(d) shouldBe localMap(p.id)(d) +- 1e-9
      }
    }
    acc2.value.keySet shouldBe localLoss.keySet
    for ((k, v) <- localLoss) acc2.value(k) shouldBe v +- 1e-9
  }

  "optimizeStateDistributed" should "match the local path on the same input" in {
    val s = spark
    import s.implicits._
    val pRows = toRows(Goldens.denseJointProbabilities)
    val ws0 = Goldens.initialEmbedding.map(p =>
      WorkingSet(p.id, p.vec.clone(), Array(0.0, 0.0), Array(1.0, 1.0)))

    val params = superstepParams.copy(iterations = 25)
    val (localPoints, localLoss) = Optimizer.optimizeLocal(
      pRows.map(r => r.copy(js = r.js.clone(), ps = r.ps.clone())),
      ws0.map(w => w.copy(y = w.y.clone(), lastGrad = w.lastGrad.clone(),
        gains = w.gains.clone())).toArray,
      params)
    val localMap = localPoints.map(p => p.id -> p.vec).toMap

    // superstep-equivalent like TsneHelpers.scala:378's loop: same loss
    // supersteps, same values, positions at 1e-9
    val acc = new MapAccumulator
    s.sparkContext.register(acc, "loss-test-statedist")
    val distPoints = Optimizer.optimizeStateDistributed(
      s.createDataset(pRows.toSeq), s.createDataset(ws0), params, Some(acc))
      .collect()
    distPoints.length shouldBe localPoints.length
    for (p <- distPoints; d <- 0 until 2) {
      withClue(s"y(${p.id})($d): ") { p.vec(d) shouldBe localMap(p.id)(d) +- 1e-9 }
    }
    acc.value.keySet shouldBe localLoss.keySet
    for ((k, v) <- localLoss) acc.value(k) shouldBe v +- 1e-9

    // the fully driver-free variant (executor-built tree, zero point
    // collection anywhere in the superstep) agrees too
    val acc2 = new MapAccumulator
    s.sparkContext.register(acc2, "loss-test-statedist-rddtree")
    val distPoints2 = Optimizer.optimizeStateDistributed(
      s.createDataset(pRows.toSeq), s.createDataset(ws0),
      params.copy(distTreeMinPoints = 0), Some(acc2)).collect()
    for (p <- distPoints2; d <- 0 until 2) {
      withClue(s"driver-free y(${p.id})($d): ") {
        p.vec(d) shouldBe localMap(p.id)(d) +- 1e-9
      }
    }
    acc2.value.keySet shouldBe localLoss.keySet
    for ((k, v) <- localLoss) acc2.value(k) shouldBe v +- 1e-9
  }

  it should "keep a point with an empty affinity row in the embedding" in {
    val s = spark
    import s.implicits._
    val pRows = toRows(Goldens.denseJointProbabilities) :+
      AffinityRow(99L, Array.empty[Long], Array.empty[Double])
    val ws0 = Goldens.initialEmbedding.map(p =>
      WorkingSet(p.id, p.vec.clone(), Array(0.0, 0.0), Array(1.0, 1.0))) :+
      WorkingSet(99L, Array(0.05, -0.05), Array(0.0, 0.0), Array(1.0, 1.0))
    // an edge-less point produces zero rows in the exploded edge table; the
    // state⋈neighborhood join must not drop it — it still feels repulsion
    // and centering, every superstep, and appears in the final output
    val out = Optimizer.optimizeStateDistributed(
      s.createDataset(pRows.toSeq), s.createDataset(ws0),
      superstepParams.copy(iterations = 5), None).collect()
    out.length shouldBe ws0.length
    out.map(_.id) should contain(99L)
    out.filter(_.id == 99L).head.vec.foreach(v => v.isNaN shouldBe false)
  }

  it should "be selected by optimize() past maxBroadcastStateRows" in {
    val s = spark
    import s.implicits._
    val pRows = toRows(Goldens.denseJointProbabilities)
    val ws0 = Goldens.initialEmbedding.map(p =>
      WorkingSet(p.id, p.vec.clone(), Array(0.0, 0.0), Array(1.0, 1.0)))
    val params = superstepParams.copy(iterations = 3)

    val viaLocal = Optimizer.optimize(
      s.createDataset(pRows.toSeq), s.createDataset(ws0), params)
      .collect().map(p => p.id -> p.vec).toMap
    val viaStateDist = Optimizer.optimize(
      s.createDataset(pRows.toSeq), s.createDataset(ws0),
      params.copy(maxLocalPEntries = 0L, maxBroadcastStateRows = 0L))
      .collect().map(p => p.id -> p.vec).toMap

    viaStateDist.keySet shouldBe viaLocal.keySet
    for ((id, v) <- viaStateDist; d <- 0 until 2) v(d) shouldBe viaLocal(id)(d) +- 1e-9
  }

  "BhTree.buildRdd" should "agree with the driver-side build" in {
    val s = spark
    val rng = new scala.util.Random(13)
    val pts = Array.fill(800)(Array(rng.nextGaussian(), rng.nextGaussian()))
    // a couple of exact duplicates exercise the mass-packet merge path
    pts(100) = pts(7).clone(); pts(200) = pts(7).clone()
    val driverTree = BhTree.build(pts)
    val rddTree = BhTree.buildRdd(
      s.sparkContext.parallelize(pts.toIndexedSeq.map(p => (p(0), p(1))), 8))
    rddTree.size shouldBe pts.length // total mass is exact (integer counts)
    for (p <- pts.take(60)) {
      // θ=0 descends to the leaves — both trees compute the exact
      // repulsion over the identical point set; θ=0.25 groups by cells,
      // whose centers of mass differ only in summation order
      for (theta <- Seq(0.0, 0.25)) {
        val (fx0, fy0, sq0) = driverTree.repulsiveForce(p(0), p(1), theta)
        val (fx1, fy1, sq1) = rddTree.repulsiveForce(p(0), p(1), theta)
        withClue(s"theta=$theta at (${p(0)}, ${p(1)}): ") {
          fx1 shouldBe fx0 +- 1e-12
          fy1 shouldBe fy0 +- 1e-12
          sq1 shouldBe sq0 +- 1e-12
        }
      }
    }
  }

  "optimize" should "take the distributed path when maxLocalPEntries = 0 and agree" in {
    val s = spark
    import s.implicits._
    val pRows = toRows(Goldens.denseJointProbabilities)
    val ws0 = Goldens.initialEmbedding.map(p =>
      WorkingSet(p.id, p.vec.clone(), Array(0.0, 0.0), Array(1.0, 1.0)))
    val params = superstepParams.copy(iterations = 3)

    val viaLocal = Optimizer.optimize(
      s.createDataset(pRows.toSeq), s.createDataset(ws0), params)
      .collect().map(p => p.id -> p.vec).toMap
    val viaDist = Optimizer.optimize(
      s.createDataset(pRows.toSeq), s.createDataset(ws0),
      params.copy(maxLocalPEntries = 0L))
      .collect().map(p => p.id -> p.vec).toMap

    viaDist.keySet shouldBe viaLocal.keySet
    for ((id, v) <- viaDist; d <- 0 until 2) v(d) shouldBe viaLocal(id)(d) +- 1e-9
  }

  "initWorkingSet" should "initialize gradient to zero, gains to one, y ~ N(0, 1e-4), seeded" in {
    val s = spark
    import s.implicits._
    val p = s.createDataset(toRows(Goldens.denseJointProbabilities).toSeq)
    val results = Optimizer.initWorkingSet(p, 2, seed = 7L).collect()
    results.length shouldBe 10
    forAll(results.toSeq) { w =>
      w.lastGrad.toSeq shouldBe Seq(0.0, 0.0)
      w.gains.toSeq shouldBe Seq(1.0, 1.0)
      w.y.length shouldBe 2
      forAll(w.y.toSeq) { y => math.abs(y) should be < 1e-3 } // σ = 1e-4
    }
    // deterministic in (seed, id): a rerun is identical, independent of partitioning
    val again = Optimizer.initWorkingSet(p.repartition(7), 2, seed = 7L)
      .collect().map(w => w.id -> w.y.toSeq).toMap
    forAll(results.toSeq) { w => again(w.id) shouldBe w.y.toSeq }
    // a different seed draws different positions
    val other = Optimizer.initWorkingSet(p, 2, seed = 8L)
      .collect().map(w => w.id -> w.y.toSeq).toMap
    results.count(w => other(w.id) == w.y.toSeq) shouldBe 0
  }

  "phases" should "replicate the reference 20/81/rest schedule" in {
    def sched(iters: Int) = Optimizer.phases(Optimizer.Params(iterations = iters))
      .map(p => (p._1, p._2, p._3))
    // ref TsneHelpers.scala:396-427: phase1 = min(n, 20) @ initial momentum,
    // exaggerated; phase2 = min(n-20, 81) @ final momentum, exaggerated;
    // phase3 = rest @ final momentum, plain P
    sched(300) shouldBe Seq((20, 0.5, true), (81, 0.8, true), (199, 0.8, false))
    sched(100) shouldBe Seq((20, 0.5, true), (80, 0.8, true))
    sched(10) shouldBe Seq((10, 0.5, true))
    sched(101) shouldBe Seq((20, 0.5, true), (81, 0.8, true))
    // loss-iteration offsets are cumulative
    Optimizer.phases(Optimizer.Params(iterations = 300)).map(_._4) shouldBe Seq(0, 20, 101)
  }

  "centerPoints" should "subtract the component means (reference centering golden)" in {
    val s = spark
    import s.implicits._
    val centred = Optimizer.centerPoints(s.createDataset(Goldens.centeringInput))
      .collect().map(p => p.id -> p.vec.toSeq).toMap
    for (e <- Goldens.centeringResults) centred(e.id) shouldBe e.vec.toSeq
  }
}
