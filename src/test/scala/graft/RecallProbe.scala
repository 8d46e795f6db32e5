package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: measure IVF-PQ recall@10 vs exact on the fixture embeddings.
  * `sbt 'Test/runMain graft.RecallProbe <sfDir>'` */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("recall-probe").master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try args.foreach { dir =>
      val k = 10
      val corpus = graft.tsne.IO.readEmbeddings(spark, dir)
      val queries = corpus.filter(col("id") < 100)
      val exact = pipeline.Ann.bruteTopK(corpus, queries, k).select("i", "j")
      val idx = pipeline.Ann.ivfPqBuild(corpus, nlist = 16, m = 32,
        ksub = 64, iters = 5, seed = 42L)
      val approx = pipeline.Ann.ivfPqTopK(idx, queries, k, nprobe = 10)
      val hits = approx.join(exact, Seq("i", "j"), "left_semi").count()
      val n = queries.count()
      println(f"RECALL $dir ivfpq recall@$k = ${hits.toDouble / (n * k)}%.4f (hits=$hits n=$n)")
      idx.release()
    } finally spark.stop()
  }
}
