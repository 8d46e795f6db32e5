package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.tsne.{Point, SparkTestBase}

/** Distributed PCA: the Jacobi eigensolver against hand-checkable
  * matrices, the moment pass against data with a KNOWN planted spectrum,
  * the contract flags, and the PCA-shortlist ANN's adaptive-beats-random
  * claim on spectrally-decaying data. */
class PcaSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  behavior of "Pca.jacobiEigSym"

  it should "diagonalize a hand-computed symmetric matrix" in {
    // [[2,1],[1,2]] → eigenvalues 3, 1; vectors (1,1)/√2, (1,−1)/√2
    val (vals, vecs) = Pca.jacobiEigSym(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    vals.sorted.toSeq.zip(Seq(1.0, 3.0)).foreach { case (g, e) =>
      g shouldBe e +- 1e-12
    }
    // reconstruct: A = V diag(λ) Vᵀ
    val d = 2
    for (i <- 0 until d; j <- 0 until d) {
      val r = (0 until d).map(c => vecs(i)(c) * vals(c) * vecs(j)(c)).sum
      r shouldBe (if (i == j) 2.0 else 1.0) +- 1e-12
    }
  }

  it should "recover a planted diagonal spectrum under rotation" in {
    val rnd = new scala.util.Random(7)
    val d = 8
    // random orthogonal Q from Gram-Schmidt over a random matrix
    val q = Array.ofDim[Double](d, d)
    for (c <- 0 until d) {
      val v = Array.fill(d)(rnd.nextGaussian())
      for (p <- 0 until c) {
        val dot = (0 until d).map(i => v(i) * q(i)(p)).sum
        for (i <- 0 until d) v(i) -= dot * q(i)(p)
      }
      val nrm = math.sqrt(v.map(x => x * x).sum)
      for (i <- 0 until d) q(i)(c) = v(i) / nrm
    }
    val planted = Array(9.0, 7.5, 5.0, 3.0, 2.0, 1.0, 0.5, 0.1)
    val a = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(c => q(i)(c) * planted(c) * q(j)(c)).sum)
    val (vals, _) = Pca.jacobiEigSym(a)
    vals.sorted.reverse.zip(planted).foreach { case (g, e) =>
      g shouldBe e +- 1e-9
    }
  }

  behavior of "Pca.fit/project/qualityReport"

  private def planted(n: Int, d: Int, seed: Int): Seq[Point] = {
    // variance d−i along axis i (after the generator's scaling) so the
    // principal directions are the coordinate axes in a known order
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => Point(i.toLong,
      Array.tabulate(d)(dd => rnd.nextGaussian() * math.sqrt(d - dd.toDouble))))
  }

  it should "find the planted principal axes in order" in {
    val s = spark
    val data = s.createDataset(planted(4000, 6, seed = 3))(
      org.apache.spark.sql.Encoders.product[Point])
    val m = Pca.fit(data, k = 3)
    m.n shouldBe 4000L
    // eigenvalues ≈ 6, 5, 4 (sample noise ~ λ·√(2/n) ≈ 0.13)
    m.eigenvalues.take(3).zip(Seq(6.0, 5.0, 4.0)).foreach { case (g, e) =>
      g shouldBe e +- 0.4
    }
    // component c is ±axis c; canonical sign makes the dominant entry
    // positive, so it is +axis c
    for (c <- 0 until 3) {
      m.components(c)(c) should be > 0.9
      for (o <- 0 until 6 if o != c)
        math.abs(m.components(c)(o)) should be < 0.2
    }
    // determinism across partitionings: moments combine associatively, so
    // a different partition count moves final ulps only — the model must
    // agree far inside the quality-gate tolerances
    val m2 = Pca.fit(data.repartition(7), k = 3)
    m.eigenvalues.zip(m2.eigenvalues).foreach { case (a, b) =>
      a shouldBe b +- 1e-9
    }
    for (c <- 0 until 3; i <- 0 until 6)
      m.components(c)(i) shouldBe m2.components(c)(i) +- 1e-9
  }

  it should "project onto the components with the mean removed" in {
    val s = spark
    val data = s.createDataset(planted(500, 4, seed = 5))(
      org.apache.spark.sql.Encoders.product[Point])
    val m = Pca.fit(data, k = 2)
    val projs = Pca.project(data, m).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val byId = data.collect().map(p => p.id -> p.vec).toMap
    projs.size shouldBe 500
    projs.foreach { case (id, pr) =>
      pr.length shouldBe 2
      for (c <- 0 until 2) {
        val expect = (0 until 4)
          .map(i => m.components(c)(i) * (byId(id)(i) - m.mean(i))).sum
        pr(c) shouldBe expect +- 1e-12
      }
    }
  }

  it should "pass every contract flag on well-formed data" in {
    val s = spark
    val data = s.createDataset(planted(2000, 8, seed = 11))(
      org.apache.spark.sql.Encoders.product[Point])
    val r = Pca.qualityReport(data, k = 4).head
    r.getLong(0) shouldBe 2000L
    r.getLong(1) shouldBe 8L
    r.getLong(2) shouldBe 4L
    // trace ≈ 8+7+…+1 = 36
    r.getDouble(3) shouldBe 36.0 +- 2.0
    r.getLong(4) shouldBe 1L // order_ok
    r.getLong(5) shouldBe 1L // ortho_ok
    r.getLong(6) shouldBe 1L // recon_ok
  }

  it should "reject degenerate inputs loudly" in {
    val s = spark
    val one = s.createDataset(Seq(Point(1L, Array(1.0, 2.0))))(
      org.apache.spark.sql.Encoders.product[Point])
    intercept[IllegalArgumentException] {
      Pca.fit(one, k = 1)
    }.getMessage should include("at least 2 rows")
    val two = s.createDataset(Seq(Point(1L, Array(1.0, 2.0)),
      Point(2L, Array(2.0, 1.0))))(
      org.apache.spark.sql.Encoders.product[Point])
    intercept[IllegalArgumentException] {
      Pca.fit(two, k = 3)
    }.getMessage should include("must be in [1, 2]")
    val ragged = s.createDataset(Seq(Point(1L, Array(1.0, 2.0)),
      Point(2L, Array(2.0, 1.0, 3.0))))(
      org.apache.spark.sql.Encoders.product[Point])
    intercept[Exception] {
      Pca.fit(ragged, k = 1)
    }.getMessage should include("dim")
  }

  behavior of "Pca.pcaTopK"

  it should "beat the JL sketch at equal m on spectrally-decaying data" in {
    val s = spark
    import s.implicits._
    // energy concentrated in the first 8 of 64 dims: PCA spends its m=8
    // dims exactly there; JL spreads over all 64
    val rnd = new scala.util.Random(17)
    val pts = (0 until 800).map { i =>
      Point(i.toLong, Array.tabulate(64)(d =>
        rnd.nextGaussian() * (if (d < 8) 4.0 else 0.25)))
    }
    val corpus = s.createDataset(pts)
    val queries = s.createDataset(pts.take(40))
    val k = 5
    val exact = Ann.bruteTopK(corpus, queries, k).select("i", "j")
    val nExact = exact.count()
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      df.select("i", "j").join(exact, Seq("i", "j"), "left_semi")
        .count().toDouble / nExact
    val pcaR = recallOf(Pca.pcaTopK(corpus, queries, k,
      nComponents = 8, shortlist = 32))
    val rpR = recallOf(Ann.rpTopK(corpus, queries, k,
      m = 8, shortlist = 32, dim = 64, seed = 42L))
    pcaR should be >= 0.9
    pcaR should be > rpR
  }
}
