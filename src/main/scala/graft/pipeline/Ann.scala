package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.tsne.{Distances, Knn, Point}

import scala.util.Random

/** Similarity search over an embedding column (`Array[Double]` after the
  * scan cast) — the query-time face of the same problem the t-SNE kNN
  * operators solve: brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH variant as the scale path (candidates from bucket
  * collisions only — no query×corpus product anywhere).
  */
object Ann {

  /** Exact top-k by cosine similarity: queries × corpus with the codegen'd
    * dot/norm expressions, ranking window per query. The right choice when
    * the query set is small (broadcast the queries) or recall must be 1. */
  def bruteTopK(corpus: Dataset[Point], queries: Dataset[Point], k: Int): DataFrame = {
    val q = queries.toDF().select(col("id").as("i"), col("vec").as("va"))
    val c = corpus.toDF().select(col("id").as("j"), col("vec").as("vb"))
    val pairs = broadcast(q).crossJoin(c)
      .where(col("i") =!= col("j"))
      .select(col("i"), col("j"),
        Distances.cosineSimCol(col("va"), col("vb")).as("sim"))
    val ranked = Knn.topKPerPointRanked(
      pairs.select(col("i"), col("j"), (-col("sim")).as("dist")), k)
    ranked.select(col("i"), col("j"), col("rn"), (-col("dist")).as("sim"))
  }

  /** Signed random-hyperplane signature: bit m = sign(v · r_m). Hyperplanes
    * are a pure function of (seed, table, bit), so signatures are
    * deterministic and partitioning-independent. */
  private def hyperplanes(seed: Long, tables: Int, bits: Int, dim: Int): Array[Array[Array[Double]]] =
    Array.tabulate(tables, bits) { (t, b) =>
      val rnd = new Random(seed ^ (t * 7919L + b) * 0x9E3779B97F4A7C15L)
      Array.fill(dim)(rnd.nextGaussian())
    }

  /** Embedding near-duplicate pairs at cosine ≥ θ, LSH-blocked: corpus
    * vectors meet only inside (table, signature) buckets, candidates are
    * exact-rescored. The scale path for near-dedup over embeddings — the
    * all-pairs form is O(N²), this shuffles tables·N signature rows and
    * rescores only bucket collisions. With enough tables the miss
    * probability at θ is negligible (p_bit = 1 − arccos(θ)/π;
    * miss = (1 − p_bit^bits)^tables), so the output equals the exact ≥θ
    * pair set w.h.p. — which is what the oracle checks. */
  def lshNearDupPairs(corpus: Dataset[Point], theta: Double,
                      tables: Int = 64, bits: Int = 4, dim: Int = 64,
                      seed: Long = 42L): DataFrame = {
    val sigs = signatureTable(corpus, tables, bits, dim, seed)
    val cands = sigs.as("a")
      .join(sigs.as("b"),
        col("a.t") === col("b.t") && col("a.sig") === col("b.sig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"))
      .distinct()
    val va = corpus.toDF().select(col("id").as("i"), col("vec").as("va"))
    val vb = corpus.toDF().select(col("id").as("j"), col("vec").as("vb"))
    cands.join(va, "i").join(vb, "j")
      .select(col("i"), col("j"),
        Distances.cosineSimCol(col("va"), col("vb")).as("sim"))
      .where(col("sim") >= theta)
  }

  /** (id, table, signature) rows for a dataset — the shared LSH hashing
    * step of [[lshTopK]] and [[lshNearDupPairs]]. */
  private def signatureTable(ds: Dataset[Point], tables: Int, bits: Int,
                             dim: Int, seed: Long): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    val planes = hyperplanes(seed, tables, bits, dim)
    val bc = spark.sparkContext.broadcast(planes)
    val nt = tables
    ds.mapPartitions { rows =>
      val ps = bc.value
      rows.flatMap { p =>
        Iterator.tabulate(nt) { t =>
          var sig = 0L
          var b = 0
          while (b < ps(t).length) {
            var dot = 0.0
            val r = ps(t)(b)
            var d = 0
            while (d < r.length) { dot += r(d) * p.vec(d); d += 1 }
            if (dot >= 0) sig |= (1L << b)
            b += 1
          }
          (p.id, t, sig)
        }
      }
    }.toDF("id", "t", "sig")
  }

  /** Approximate top-k by multi-table hyperplane LSH: `tables` independent
    * `bits`-bit signatures; query and corpus vectors meet when they share a
    * (table, signature) bucket; candidates are exact-rescored and ranked.
    * Cost: corpus is hashed once (tables·N rows shuffled by bucket), and
    * the join output is only real collisions — at 100 TB this is the
    * difference between a bucket-join and an impossible N·Q cross product.
    * Recall is tuned by (tables, bits): more tables → higher recall, more
    * candidates; more bits → fewer, purer candidates. */
  def lshTopK(corpus: Dataset[Point], queries: Dataset[Point], k: Int,
              tables: Int = 8, bits: Int = 12, dim: Int = 64,
              seed: Long = 42L): DataFrame = {
    def signatures(ds: Dataset[Point]): DataFrame =
      signatureTable(ds, tables, bits, dim, seed)

    val cands = signatures(queries).select(col("id").as("i"), col("t"), col("sig"))
      .join(signatures(corpus).select(col("id").as("j"), col("t"), col("sig")),
        Seq("t", "sig"))
      .where(col("i") =!= col("j"))
      .select("i", "j").distinct()

    val q = queries.toDF().select(col("id").as("i"), col("vec").as("va"))
    val c = corpus.toDF().select(col("id").as("j"), col("vec").as("vb"))
    val scored = cands.join(broadcast(q), "i").join(c, "j")
      .select(col("i"), col("j"),
        Distances.cosineSimCol(col("va"), col("vb")).as("sim"))
    val ranked = Knn.topKPerPointRanked(
      scored.select(col("i"), col("j"), (-col("sim")).as("dist")), k)
    ranked.select(col("i"), col("j"), col("rn"), (-col("dist")).as("sim"))
  }
}
