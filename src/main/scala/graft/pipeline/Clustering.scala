package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

/** Cross-engine-exact distributed k-means — Lloyd's algorithm in integer
  * fixed-point, the clustering primitive behind SemDeDup-style semantic
  * dedup and IVF coarse quantizers ([[Ann.ivfBuild]] runs a float
  * spherical variant tuned for recall; THIS one trades spherical updates
  * for bit-exact determinism so the assignment itself is a verifiable
  * driver-contract row, not just a recall floor).
  *
  * Exactness: coordinates quantize ONCE to a 1e-6 integer grid
  * (`floor(v·1e6 + 0.5)`, the [[graft.ops.ExactNum.gridLong]] spelling);
  * every distance is a long sum of squared long diffs, every centroid
  * update a truncated integer mean (`div`, matching DuckDB `//`), and the
  * argmin packs `(dist, cluster)` into one long (`dist·2^10 + cluster`) so
  * a single map-side-combinable `min` both ranks and tie-breaks (equal
  * distances go to the lowest cluster id). No float op anywhere after the
  * initial grid cast ⇒ assignments are bit-identical across partitionings,
  * runs, and engines — the DuckDB oracle replays every iteration.
  *
  * Scale shape, per iteration: one `crossJoin(broadcast(centroids))` over
  * the points (k·dim longs — kilobytes — broadcast, fan-out k per point,
  * all map-side) into one hash aggregate on the point id (the packed-min),
  * then one slim id-keyed join + one (cluster, dim) hash aggregate for the
  * update — both map-side combinable, shuffle ∝ N + k·dim. The k-row
  * centroid table is `localCheckpoint`ed each round (kilobytes) so the
  * logical plan stays flat across iterations, the same lineage-cut rule as
  * the PageRank/CC loops. The only driver data is the k seed rows and the
  * per-round k·dim centroid table — never anything O(N). */
object Clustering {

  /** Quantize a float/double vector column to 1e-6-grid longs — one IEEE
    * multiply+add+floor per element on identical operands in both
    * engines. */
  private def quantize(vec: Column): Column =
    transform(vec, v =>
      floor(v.cast("double") * lit(1e6) + lit(0.5)).cast("long"))

  /** Packing multiplier for the (distance, cluster) argmin: 2^10 cluster
    * slots (a coarse quantizer rarely wants k past a few hundred; IVF's
    * nlist at this fixture is 16). The squared grid distance must then
    * stay under 2^53 — 64-dim unit-scale embeddings on the 1e-6 grid are
    * bounded by 64·(2·10^6)² ≈ 2^58/32 ≈ 2^48 — and an in-plan
    * `raise_error` guard turns a wider-than-supported input into a loud
    * failure instead of a silent wrap (the Layout.fixedWidthBucket
    * rule). */
  private val ClusterSlots = 1L << 10
  private val MaxDist = Long.MaxValue / ClusterSlots

  /** Lloyd's k-means over `(idCol, vecCol)` rows: `iters` assignment
    * rounds with `iters − 1` centroid updates in between (the final
    * assignment is the output). Seeding is deterministic: the k lowest-id
    * points are the initial centroids, cluster ids 0..k−1 in id order.
    * Empty clusters keep their previous centroid. Returns
    * `(idCol, cluster)`. */
  def kmeansExact(points: DataFrame, k: Int, iters: Int,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && k < ClusterSlots, s"k must be in [1, 2^10), got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = points.sparkSession
    // consumed once per assignment round and once per update — cut the
    // scan+quantize lineage once instead of re-deriving it each round
    val pts = points
      .select(col(idCol).cast("long").as("id"), quantize(col(vecCol)).as("qv"))
      .localCheckpoint()

    // deterministic seed: k lowest-id points, cluster = rank in id order.
    // Driver-bounded collect (k rows of dim longs), like the IVF nlist
    // centroids.
    val seed = pts.orderBy("id").limit(k).collect()
    val centSchema = StructType(Seq(
      StructField("cl", LongType, nullable = false),
      StructField("cv", ArrayType(LongType), nullable = false)))
    var cents = spark.createDataFrame(
      java.util.Arrays.asList(seed.zipWithIndex.map { case (r, i) =>
        Row(i.toLong, r.getSeq[Long](1))
      }: _*), centSchema)

    def assign(c: DataFrame): DataFrame = {
      val dist = aggregate(
        zip_with(col("qv"), col("cv"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x)
      val guarded = when(dist > lit(MaxDist),
        raise_error(concat(
          lit("kmeansExact: squared grid distance exceeds the packed-argmin " +
            "bound (dist="),
          dist.cast("string"),
          lit(s", max=$MaxDist); rescale the vectors or coarsen the grid")))
          .cast("long"))
        .otherwise(dist)
      pts.crossJoin(broadcast(c))
        .select(col("id"),
          (guarded * lit(ClusterSlots) + col("cl")).as("code"))
        .groupBy("id").agg(min(col("code")).as("code"))
        .select(col("id"), pmod(col("code"), lit(ClusterSlots)).as("cl"))
    }

    var round = 1
    var asg = assign(cents)
    while (round < iters) {
      val means = asg.join(pts, "id")
        .select(col("cl"), posexplode(col("qv")).as(Seq("dim", "v")))
        .groupBy("cl", "dim")
        .agg(sum("v").as("sv"), count(lit(1)).as("n"))
        .select(col("cl"), col("dim"),
          call_function("div", col("sv"), col("n")).as("mv"))
        .groupBy("cl")
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("mv")))),
          s => s.getField("mv")).as("cv"))
      cents = cents.select(col("cl"), col("cv").as("__prev"))
        .join(means, Seq("cl"), "left")
        .select(col("cl"), coalesce(col("cv"), col("__prev")).as("cv"))
        .localCheckpoint() // k rows — keeps every round's plan flat
      asg = assign(cents)
      round += 1
    }
    asg.select(col("id").as(idCol), col("cl").cast("long").as("cluster"))
  }
}
