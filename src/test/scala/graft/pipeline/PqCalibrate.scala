package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off calibration for the q_ann_pq recall floor: recall@10 of PQ-ADC
  * vs exact cosine top-10 on the fixture embeddings, per (m, ksub).
  * `sbt 'Test/runMain graft.pipeline.PqCalibrate'` */
object PqCalibrate {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("pq-calibrate").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 10
    try for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01");
             (m, ksub) <- Seq((16, 16), (32, 16), (32, 64))) {
      val corpus = graft.tsne.IO.readEmbeddings(spark, dir)
      val queries = corpus.filter(col("id") < 100)
      val exact = Ann.bruteTopK(corpus, queries, k).select("i", "j")
      val t0 = System.nanoTime()
      val idx = Ann.pqBuild(corpus, m, ksub, iters = 5, seed = 42L)
      val approx = Ann.pqTopK(idx, queries, k)
      val hits = approx.join(exact, Seq("i", "j"), "left_semi").count()
      val nq = queries.count()
      idx.release()
      println(f"PQCALIB $dir m=$m ksub=$ksub recall=${hits.toDouble / (nq * k)}%.3f " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    } finally spark.stop()
  }
}
