package graft.tsne

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Embedding-quality metrics — the gate a real t-SNE user runs on every
  * embedding. SURVEY §5's rebuild test plan calls for a
  * trustworthiness/neighbor-recall check on the full pipeline (the
  * reference pins only a single superstep golden,
  * `TsneHelpersTestSuite.scala:273-327`, and never grades its output). */
object Quality {

  /** Neighbor recall@k: the fraction of (point, input-space-kNN) pairs that
    * survive as (point, embedding-space-kNN) pairs. 1.0 = every local
    * neighborhood preserved; k/(N−1) ≈ chance for a structure-free
    * embedding.
    *
    * `truthPairs` is the input-space kNN pair set `(i, j)` — passed in
    * rather than recomputed so callers can reuse the N² pass that already
    * fed the pipeline. The embedding side is its own kNN (2-D, cheap), a
    * semi join, and one global count: no per-point state leaves the
    * executors, so the metric costs O(N²_lowdim) like any kNN, not a
    * driver collect. Returns one row `(n_points, truth_pairs, hits)`;
    * recall = hits / truth_pairs (NOT hits / n·k — a sparse truth graph
    * where some point has fewer than k neighbors would cap the latter
    * below 1.0 for a perfect embedding). */
  /** Deterministic clustered point cloud for the discriminating quality
    * gate (`q_tsne_quality_clustered`): `clusters` Gaussian blobs, centers
    * ~ N(0, 10²) per dimension, unit within-cluster noise, round-robin
    * assignment. A pure sequential function of its arguments — generated
    * on the driver (tiny) so the draw is partition-independent, then
    * parallelized by the caller. With blobs of ~20 points, a healthy
    * embedding keeps each blob coherent in 2-D and recovers most exact
    * top-k neighborhoods; an optimizer that loses a schedule phase leaves
    * blobs unseparated and demonstrably fails the floor (`QualitySpec`). */
  def clusteredCloud(n: Int, clusters: Int, dim: Int, seed: Long): IndexedSeq[Point] = {
    val rng = new java.util.Random(seed)
    val centers = Array.fill(clusters, dim)(rng.nextGaussian() * 10.0)
    (0 until n).map { i =>
      val c = centers(i % clusters)
      Point(i.toLong, Array.tabulate(dim)(d => c(d) + rng.nextGaussian()))
    }
  }

  def neighborRecall(truthPairs: DataFrame, emb: Dataset[Point], k: Int,
                     metric: String = "sqeuclidean"): DataFrame = {
    val embKnn = Knn.bruteForce(emb, k, metric).toDF().select(col("i"), col("j"))
    // one left join counts both sides at once: embKnn pairs are unique
    // (ranked top-k), so no truth row fans out
    val counted = truthPairs.select(col("i"), col("j"))
      .join(embKnn.withColumn("__in_emb", lit(1)), Seq("i", "j"), "left")
      .agg(count(lit(1)).as("truth_pairs"),
        sum(coalesce(col("__in_emb"), lit(0))).cast("long").as("hits"))
    emb.toDF().agg(count(lit(1)).as("n_points")).crossJoin(counted)
  }
}
