package graft.tsne

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** High-dimensional affinity computation (ref: `TsneHelpers.scala:162-196,
  * 434-504` and the sparse-row assembly at `Tsne.scala:119-129`).
  */
object Affinities {

  // ---------------- O21: per-point perplexity calibration (pure math) ----

  /** Entropy H(Pᵢ) at a given β = 1/2σ² (ref `TsneHelpers.scala:490-495`):
    * H = log ΣP + β · Σ(d·P)/ΣP with ΣP floored at 1e-7. */
  private[tsne] def computeH(dists: Array[Double], beta: Double): Double = {
    var sumP = 0.0
    var sumDP = 0.0
    var k = 0
    while (k < dists.length) {
      val p = math.exp(-dists(k) * beta)
      sumP += p
      sumDP += dists(k) * p
      k += 1
    }
    if (sumP == 0.0) sumP = 1e-7
    math.log(sumP) + beta * sumDP / sumP
  }

  /** Normalized conditional probabilities p_{j|i} at a given β
    * (ref `TsneHelpers.scala:497-504`, same 1e-7 zero-sum guard). */
  private[tsne] def computeP(dists: Array[Double], beta: Double): Array[Double] = {
    val p = new Array[Double](dists.length)
    var sumP = 0.0
    var k = 0
    while (k < dists.length) { p(k) = math.exp(-dists(k) * beta); sumP += p(k); k += 1 }
    if (sumP == 0.0) sumP = 1e-7
    k = 0
    while (k < dists.length) { p(k) /= sumP; k += 1 }
    p
  }

  /** 50-iteration bisection on β to hit H(Pᵢ) = log(perplexity) within 1e-5
    * (ref `TsneHelpers.scala:434-488`): doubles β while unbounded above,
    * halves while unbounded below, bisects once bracketed. Iterative rather
    * than the reference's recursion — same sequence of β values. */
  private[tsne] def calibrateBeta(dists: Array[Double], perplexity: Double,
                                  maxIter: Int = 50, tol: Double = 1e-5): Array[Double] = {
    val targetH = math.log(perplexity)
    var beta = 1.0
    var lo = Double.NegativeInfinity
    var hi = Double.PositiveInfinity
    var iter = maxIter
    var h = computeH(dists, beta)
    while (math.abs(h - targetH) >= tol && iter > 0) {
      if (h - targetH > 0) {
        // entropy too high -> raise beta; current guess becomes lower bound
        lo = beta
        beta = if (hi.isInfinite) beta * 2 else (beta + hi) / 2
      } else {
        hi = beta
        beta = if (lo.isInfinite) beta / 2 else (beta + lo) / 2
      }
      h = computeH(dists, beta)
      iter -= 1
    }
    computeP(dists, beta)
  }

  // ---------------- O10: pairwise affinities ----------------------------

  /** Conditional distribution p_{j|i} from kNN distances
    * (ref `TsneHelpers.scala:162-180`): one shuffle on `i`, then the pure
    * per-group binary search. `flatMapGroups` is the Spark form of the
    * reference's `groupBy(i).reduceGroup`. */
  def pairwiseAffinities(knn: Dataset[Neighbor], perplexity: Double): Dataset[Neighbor] = {
    val spark = knn.sparkSession
    import spark.implicits._
    knn.groupByKey(_.i)
      .flatMapGroups { (i, rows) =>
        val arr = rows.toArray
        val p = calibrateBeta(arr.map(_.dist), perplexity)
        arr.indices.iterator.map(k => Neighbor(i, arr(k).j, p(k)))
      }
  }

  // ---------------- O11: joint distribution ------------------------------

  /** Symmetrize + normalize (ref `TsneHelpers.scala:182-196`):
    * p_ij = (p_{j|i} + p_{i|j}) / Σ. Expressed relationally — union with the
    * transposed copy, hash-aggregate on (i, j) (partial map-side combine for
    * free), then divide by the global sum via a 1-row cross join.
    *
    * The symmetrized aggregate is persisted before the global sum is
    * derived from it: the normalization needs two passes over `sym` (one to
    * reduce it to Σ, one to divide), and without a cache Spark re-executes
    * the whole upstream — including the O(N²) kNN — once per pass
    * (this was 73% of the round-1 bench, VERDICT r1 "what's wrong" #1).
    * The cache holds N·k skinny rows, safely evictable (MEMORY_AND_DISK).
    *
    * (The reference's `max(_, Double.MinValue)` clamps at `:191,194` are
    * no-ops — scala `Double.MinValue` is −1.8e308 — so plain division is
    * faithful; SURVEY.md §2 O11.) */
  def jointDistribution(p: Dataset[Neighbor]): Dataset[Neighbor] =
    jointDistributionWithRelease(p)._1

  /** [[jointDistribution]] plus a release handle for the internal cache:
    * call it once the result has been fully consumed (the pipeline does so
    * after `optimize` returns). Without releasing, the cached symmetrized
    * aggregate lives until the session ends — harmless for one-shot jobs,
    * a leak for long-lived sessions. */
  def jointDistributionWithRelease(p: Dataset[Neighbor]): (Dataset[Neighbor], () => Unit) = {
    val spark = p.sparkSession
    import spark.implicits._
    val df = p.toDF()
    val sym = df.union(df.select(col("j").as("i"), col("i").as("j"), col("dist")))
      .groupBy("i", "j").agg(sum("dist").as("dist"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = sym.agg(sum("dist").as("total"))
    val out = sym.crossJoin(total)
      .select(col("i"), col("j"), (col("dist") / col("total")).as("dist"))
      .as[Neighbor]
    (out, () => { sym.unpersist(); () })
  }

  // ---------------- O12: COO → sparse-row assembly -----------------------

  /** Group the joint distribution by row id into parallel (j, p) arrays,
    * sorted by j (ref `Tsne.scala:119-129` builds a Breeze SparseVector of
    * fake capacity n²; only the active entries matter). One hash shuffle. */
  def toAffinityRows(joint: Dataset[Neighbor]): Dataset[AffinityRow] = {
    val spark = joint.sparkSession
    import spark.implicits._
    joint.groupByKey(_.i)
      .mapGroups { (i, rows) =>
        val sorted = rows.toArray.sortBy(_.j)
        AffinityRow(i, sorted.map(_.j), sorted.map(_.dist))
      }
  }

  /** Full affinity pipeline: kNN distances → P as sparse rows, with the
    * early-exaggeration factor applied lazily by the optimizer. Returns
    * the release handle of the internal joint-distribution cache. */
  def highDimAffinitiesWithRelease(knn: Dataset[Neighbor],
                                   perplexity: Double): (Dataset[AffinityRow], () => Unit) = {
    val (joint, release) = jointDistributionWithRelease(pairwiseAffinities(knn, perplexity))
    (toAffinityRows(joint), release)
  }

  def highDimAffinities(knn: Dataset[Neighbor], perplexity: Double): Dataset[AffinityRow] =
    highDimAffinitiesWithRelease(knn, perplexity)._1
}
