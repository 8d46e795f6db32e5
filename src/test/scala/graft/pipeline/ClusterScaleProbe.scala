package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[Clustering.kmeansExact]]: replicate the sf0.1
  * embeddings with shifted ids to ×16 and compare wall time — the
  * per-iteration cost is one broadcast fan-out + two hash aggregates, so
  * time should grow ~linearly in N while the centroid table (k·dim longs)
  * stays constant. `sbt 'Test/runMain graft.pipeline.ClusterScaleProbe'`;
  * results recorded in SCALE.md. */
object ClusterScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("cluster-scale-probe")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select("vec_id", "embedding")
    def run(copies: Int): Unit = {
      val df = (0 until copies).map(c =>
        base.withColumn("vec_id", col("vec_id") + lit(c * 1000000L)))
        .reduce(_ union _)
        .localCheckpoint()
      val n = df.count()
      // min of 2, like Bench: strips JIT warm-up
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        Clustering.kmeansExact(df, k = 8, iters = 3).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"KMSCALE copies=$copies rows=$n sec=${ts.min}%.2f")
    }
    run(1)
    run(16)
    spark.stop()
  }
}
