package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Embedding near-dup routing evidence (SCALE.md "Embedding near-dup"
  * section): on CLUSTERED data at high θ — SemDeDup's home regime — how do
  * the three pair generators compare at N=20,000? Prints time + pair-set
  * size for (a) the all-pairs cross join, (b) hyperplane LSH, (c) k-means
  * cell candidates (`semanticNearDupPairs`), all rescored exactly at the
  * same θ, plus each approximate path's recall of the exact pair set.
  * `sbt 'Test/runMain graft.NearDupScale'` */
object NearDupScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("neardup-scale")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try {
      val n = 20000
      val dim = 64
      val nClusters = 200
      // centered clusters (LSH's good case too — fair fight), tight noise
      // so θ=0.99 pairs are genuine near-dups within a cluster
      val pts = spark.range(0, n, 1, 32).map { i =>
        val rnd = new java.util.Random(0xC0FFEEL ^ (i * 0x9E3779B97F4A7C15L))
        val crnd = new java.util.Random(1234L + (i % nClusters))
        val c = Array.fill(dim)(crnd.nextGaussian() * 5)
        graft.tsne.Point(i, c.map(_ + rnd.nextGaussian() * 0.05))
      }.cache()
      pts.count()
      val theta = 0.99

      def time[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }

      val (exact, exactT) = time {
        val a = pts.toDF().repartition(32)
          .select(col("id").as("i"), col("vec").as("va"))
        val b = pts.toDF().select(col("id").as("j"), col("vec").as("vb"))
        a.crossJoin(b).where(col("i") < col("j"))
          .where(graft.tsne.Distances.cosineSimCol(col("va"), col("vb")) >= theta)
          .select("i", "j").cache().count()
      }
      val exactDf = {
        val a = pts.toDF().repartition(32)
          .select(col("id").as("i"), col("vec").as("va"))
        val b = pts.toDF().select(col("id").as("j"), col("vec").as("vb"))
        a.crossJoin(b).where(col("i") < col("j"))
          .where(graft.tsne.Distances.cosineSimCol(col("va"), col("vb")) >= theta)
          .select("i", "j").cache()
      }
      exactDf.count()

      val (lshN, lshT) = time(
        pipeline.Ann.lshNearDupPairs(pts, theta, tables = 32, bits = 16,
          dim = dim, seed = 42L).select("i", "j").cache().count())
      val lshDf = pipeline.Ann.lshNearDupPairs(pts, theta, tables = 32,
        bits = 16, dim = dim, seed = 42L).select("i", "j")
      val lshHits = lshDf.join(exactDf, Seq("i", "j"), "left_semi").count()

      val (semN, semT) = time(
        pipeline.Ann.semanticNearDupPairs(pts, theta, nlist = 128,
          probes = 2, iters = 5, seed = 42L).select("i", "j").cache().count())
      val semDf = pipeline.Ann.semanticNearDupPairs(pts, theta, nlist = 128,
        probes = 2, iters = 5, seed = 42L).select("i", "j")
      val semHits = semDf.join(exactDf, Seq("i", "j"), "left_semi").count()
      val semCands = pipeline.Ann.semanticNearDupPairs(pts, theta = -1.0,
        nlist = 128, probes = 2, iters = 5, seed = 42L).count()

      println(f"NEARDUP n=$n clusters=$nClusters theta=$theta " +
        f"exact=$exactT%.1fs($exact) lsh=$lshT%.1fs($lshN recall=${lshHits.toDouble / exact}%.4f) " +
        f"sem=$semT%.1fs($semN recall=${semHits.toDouble / exact}%.4f " +
        f"cands=$semCands candfrac=${semCands.toDouble / (n.toLong * (n - 1) / 2)}%.4f)")
    } finally spark.stop()
  }
}
