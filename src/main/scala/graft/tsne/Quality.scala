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
    * driver collect. Returns one row `(n_points, hits)`. */
  def neighborRecall(truthPairs: DataFrame, emb: Dataset[Point], k: Int,
                     metric: String = "sqeuclidean"): DataFrame = {
    val embKnn = Knn.bruteForce(emb, k, metric).toDF().select(col("i"), col("j"))
    val hits = truthPairs.select(col("i"), col("j"))
      .join(embKnn, Seq("i", "j"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    emb.toDF().agg(count(lit(1)).as("n_points")).crossJoin(hits)
  }
}
