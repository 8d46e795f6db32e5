package graft.tsne

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Ports the reference's kNN operator tests (ref
  * `TsneHelpersTestSuite.scala:29-74`): all three variants on the 9-point
  * collinear lattice, exact-match against the hand-computed golden set.
  */
class KnnSpec extends AnyFlatSpec with Matchers with org.scalatest.Inspectors with SparkTestBase {

  private def asSet(res: Seq[Neighbor]): Set[(Long, Long, Double)] =
    res.map(n => (n.i, n.j, n.dist)).toSet

  "bruteForce kNN" should "return the k nearest neighbors for each point" in {
    val s = spark
    import s.implicits._
    val input = s.createDataset(Goldens.knnInput)
    val results = Knn.bruteForce(input, 2, "sqeuclidean").collect().toSeq
    results.size shouldBe Goldens.knnResults.size
    // Ties at equal distance are broken by j ascending in the rebuild; the
    // golden set contains every admissible neighbor, so membership is the
    // right check (same as the reference's `should contain`).
    forAll(results) { r => Goldens.knnResults should contain((r.i, r.j, r.dist)) }
  }

  "partitionKnn" should "match the brute-force result" in {
    val s = spark
    import s.implicits._
    val input = s.createDataset(Goldens.knnInput)
    val results = Knn.partitionKnn(input, 2, "sqeuclidean", 3).collect().toSeq
    results.size shouldBe Goldens.knnResults.size
    forAll(results) { r => Goldens.knnResults should contain((r.i, r.j, r.dist)) }
  }

  it should "match brute force on the 10x784 fixture for every block count" in {
    val s = spark
    import s.implicits._
    val input = IO.readInput(s, fixturePath("dense_input.csv"), 784)
    val expected = asSet(Knn.bruteForce(input, 3, "sqeuclidean").collect().toSeq)
    for (blocks <- Seq(1, 2, 4)) {
      asSet(Knn.partitionKnn(input, 3, "sqeuclidean", blocks).collect().toSeq) shouldBe expected
    }
  }

  "projectKnn" should "produce k rows per point with high recall on the lattice" in {
    val s = spark
    import s.implicits._
    val input = s.createDataset(Goldens.knnInput)
    val k = 2
    val results = Knn.projectKnn(input, k, "sqeuclidean", iterations = 4,
      seed = 42L, dimension = 4).collect().toSeq
    // shape: exactly k candidates per point
    results.groupBy(_.i).foreach { case (_, rows) => rows.size shouldBe k }
    // the ±k z-order window on collinear points recovers the true neighbors
    val hits = results.count(r => Goldens.knnResults.contains((r.i, r.j, r.dist)))
    hits.toDouble / results.size should be >= 0.8
  }

  "rankWithinProjection" should "assign exact per-projection ranks across partitions" in {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5L)
    // multiple projections, enough rows to span several range partitions
    val rows = (0 until 3).flatMap { proj =>
      (0 until 500).map { i =>
        (proj, i.toLong, ZOrderKey.morton(Array(rnd.nextDouble(), rnd.nextDouble())))
      }
    }
    val got = Knn.rankWithinProjection(s.createDataset(rows).repartition(7))
      .collect().map { case (p, id, r) => (p, id) -> r }.toMap
    // ground truth: index in the (z, id)-sorted order, per projection
    implicit val byteOrd: Ordering[Array[Byte]] =
      (a: Array[Byte], b: Array[Byte]) => java.util.Arrays.compareUnsigned(a, b)
    rows.groupBy(_._1).foreach { case (proj, group) =>
      group.sortBy(t => (t._3, t._2)).zipWithIndex.foreach { case ((_, id, _), idx) =>
        got((proj, id)) shouldBe idx.toLong
      }
    }
  }

  it should "reach full recall on the fixture with enough projections" in {
    val s = spark
    import s.implicits._
    val input = IO.readInput(s, fixturePath("dense_input.csv"), 784)
    val truth = asSet(Knn.bruteForce(input, 3, "sqeuclidean").collect().toSeq).map(t => (t._1, t._2))
    val approx = Knn.projectKnn(input, 3, "sqeuclidean", iterations = 6,
      seed = 42L, dimension = 784).collect().toSeq
    val hits = approx.count(r => truth.contains((r.i, r.j)))
    hits.toDouble / truth.size should be >= 0.9
  }

  it should "hold recall at a FIXED window on clustered data with sub-quadratic candidates" in {
    // The scale guard behind q_knn_project's window cap (VERDICT r3
    // next-round #5): on data with low-dimensional structure, a constant
    // window holds its recall as N grows — so candidate volume grows
    // ~linearly in N, not quadratically. (Isotropic data is the documented
    // exception: route to Ann.lshTopK per Knn.projectKnn's scaladoc.)
    val s = spark
    import s.implicits._
    val k = 10
    val window = 40
    val dim = 16
    def clustered(n: Int): Seq[Point] = {
      val rng = new scala.util.Random(7L)
      val centers = Array.fill(20)(Array.fill(dim)(rng.nextGaussian() * 10.0))
      (0 until n).map { i =>
        val c = centers(i % centers.length)
        Point(i.toLong, Array.tabulate(dim)(d => c(d) + rng.nextGaussian() * 0.5))
      }
    }
    val counts = for (n <- Seq(500, 2000)) yield {
      val pts = s.createDataset(clustered(n))
      val truth = asSet(Knn.bruteForce(pts, k, "sqeuclidean").collect().toSeq)
        .map(t => (t._1, t._2))
      val approx = Knn.projectKnn(pts, k, "sqeuclidean", iterations = 8,
        seed = 42L, dimension = dim, window = window).collect().toSeq
      val hits = approx.count(r => truth.contains((r.i, r.j)))
      withClue(s"recall at n=$n, fixed window=$window: ") {
        hits.toDouble / truth.size should be >= 0.9
      }
      val (cands, _, _) = Knn.projectCandidates(pts, k, iterations = 8,
        seed = 42L, dimension = dim, window = window)
      cands.count()
    }
    // 4x the points: candidates grow ~4x (linear), nowhere near 16x
    // (quadratic); 6x allows for boundary effects
    counts(1).toDouble / counts(0) should be < 6.0
  }

  "knn metrics" should "agree with the scalar kernels on euclidean and cosine" in {
    val s = spark
    import s.implicits._
    // drop the all-zero point: cosine distance to it is NaN (0/0), in both
    // the Breeze reference (`Tsne.scala:165`) and this rebuild
    val pts = Goldens.knnInput.filter(_.id != 0L)
    val input = s.createDataset(pts)
    val vecs = pts.map(p => p.id -> p.vec).toMap
    for (metric <- Seq("euclidean", "cosine")) {
      val fn = Distances.byName(metric)
      val byCol = Knn.bruteForce(input, 2, metric).collect()
      forAll(byCol.toSeq) { r =>
        r.dist shouldBe fn(vecs(r.i), vecs(r.j)) +- 1e-12
      }
    }
  }
}
