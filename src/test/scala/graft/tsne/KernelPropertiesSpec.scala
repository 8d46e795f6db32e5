package graft.tsne

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.Inspectors

import scala.util.Random

/** Property-style tests for the pure math kernels — invariants that must
  * hold for *any* input, complementing the fixed golden values. Sampling is
  * seeded and explicit (the offline cache has no scalatest↔scalacheck
  * bridge), 200 cases per property.
  */
class KernelPropertiesSpec extends AnyFlatSpec with Matchers with Inspectors {

  private val rnd = new Random(20260812L)
  private def distArray(): Array[Double] =
    Array.fill(2 + rnd.nextInt(38))(0.01 + rnd.nextDouble() * 1000)
  private def vec(n: Int): Array[Double] =
    Array.fill(n)((rnd.nextDouble() - 0.5) * 200)

  "calibrateBeta" should "always produce a normalized distribution at target entropy" in {
    for (_ <- 1 to 200) {
      val dists = distArray()
      // target entropy must be reachable: max H over n states is log n,
      // so keep perplexity well under the state count
      val perplexity = 1.5 + rnd.nextDouble() * (math.min(6.0, 0.8 * dists.length) - 1.5)
      val p = Affinities.calibrateBeta(dists, perplexity)
      p.sum shouldBe 1.0 +- 1e-9
      forAll(p.toSeq) { _ should be >= 0.0 }
      val h = -p.filter(_ > 0).map(x => x * math.log(x)).sum
      // bisection tolerance 1e-5 on H, plus slack for the 50-iter cap
      h shouldBe math.log(perplexity) +- 0.05
    }
  }

  "computeH and computeP" should "be consistent (H equals entropy of P)" in {
    for (_ <- 1 to 200) {
      val dists = distArray()
      val beta = 0.001 + rnd.nextDouble() * 2
      val h = Affinities.computeH(dists, beta)
      val p = Affinities.computeP(dists, beta)
      // the identity needs ΣP > 0; under total exp-underflow both sides hit
      // the reference's 1e-7 clamp and diverge by design (TsneHelpers
      // .scala:490-495) — the bisection never stays in that regime
      if (p.sum > 0.5) {
        val entropy = -p.filter(_ > 0).map(x => x * math.log(x)).sum
        // H = log ΣP + β·Σ(dP)/ΣP is algebraically the Shannon entropy of P
        h shouldBe entropy +- math.max(1e-8, math.abs(h) * 1e-6)
      }
    }
  }

  "Gradient.update" should "keep gains at or above minGain and apply the step" in {
    for (_ <- 1 to 200) {
      val y = vec(2); val step = vec(2); val grad = vec(2)
      val (ny, ns, ng) = Gradient.update(y, step, Array(1.0, 1.0), grad,
        minGain = 0.01, momentum = 0.5, learningRate = 100)
      forAll(ng.toSeq) { _ should be >= 0.01 }
      for (d <- 0 until 2) {
        ns(d) shouldBe (0.5 * step(d) - 100 * ng(d) * grad(d)) +- 1e-9
        ny(d) shouldBe (y(d) + ns(d)) +- 1e-9
      }
    }
  }

  "metrics" should "satisfy metric identities" in {
    for (_ <- 1 to 200) {
      val n = 2 + rnd.nextInt(30)
      val a = vec(n); val b = vec(n)
      Distances.sqEuclidean(a, b) should be >= 0.0
      Distances.sqEuclidean(a, a) shouldBe 0.0
      Distances.sqEuclidean(a, b) shouldBe Distances.sqEuclidean(b, a)
      Distances.euclidean(a, b) shouldBe math.sqrt(Distances.sqEuclidean(a, b)) +- 1e-12
      val c = Distances.cosine(a, b)
      c should (be >= -1e-12 and be <= 2.0 + 1e-12)
      Distances.cosine(a, a) shouldBe 0.0 +- 1e-12
    }
  }

  "BhTree with theta = 0" should "match brute-force repulsion on random clouds" in {
    for (_ <- 1 to 60) {
      val pts = Array.fill(3 + rnd.nextInt(57))(
        Array(rnd.nextDouble() * 20 - 10, rnd.nextDouble() * 20 - 10))
      val tree = BhTree.build(pts)
      val p = pts(0)
      var efx = 0.0; var efy = 0.0; var esq = 0.0
      for (j <- pts.indices if pts(j)(0) != p(0) || pts(j)(1) != p(1)) {
        val dx = p(0) - pts(j)(0); val dy = p(1) - pts(j)(1)
        val d = dx * dx + dy * dy
        val q = 1.0 / (1.0 + d)
        esq += q; efx += q * q * dx; efy += q * q * dy
      }
      val (fx, fy, sq) = tree.repulsiveForce(p(0), p(1), 0.0)
      fx shouldBe efx +- 1e-9
      fy shouldBe efy +- 1e-9
      sq shouldBe esq +- 1e-9
    }
  }

  "ZOrder key vs comparator" should "agree on random non-negative vectors" in {
    for (_ <- 1 to 500) {
      val n = 1 + rnd.nextInt(6)
      val a = Array.fill(n)(rnd.nextDouble() * 1e6)
      val b = Array.fill(n)(rnd.nextDouble() * 1e6)
      val byKey = java.util.Arrays.compareUnsigned(
        ZOrderKey.morton(a), ZOrderKey.morton(b)) > 0
      byKey shouldBe ZOrderKey.compareByZorder(a, b)
    }
  }
}
