package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: sweep IVF-PQ (residual) recall@10 over (nlist, nprobe) on the
  * fixture embeddings. `sbt 'Test/runMain graft.ResidSweep <sfDir>'` */
object ResidSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("resid-sweep").master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try args.foreach { dir =>
      val k = 10
      val corpus = graft.tsne.IO.readEmbeddings(spark, dir)
      val n = corpus.count()
      val queries = corpus.filter(col("id") < 100)
      val exact = pipeline.Ann.bruteTopK(corpus, queries, k).select("i", "j")
        .localCheckpoint()
      for (nlist <- Seq(16); iters <- Seq(5); nprobe <- Seq(10)) {
        val idx = pipeline.Ann.ivfPqBuild(corpus, nlist = nlist, m = 32,
          ksub = 64, iters = iters, seed = 42L)
        val approx = pipeline.Ann.ivfPqTopK(idx, queries, k, nprobe = nprobe)
        val hits = approx.join(exact, Seq("i", "j"), "left_semi").count()
        println(f"SWEEP $dir n=$n nlist=$nlist iters=$iters nprobe=$nprobe adc recall@$k = ${hits.toDouble / (100 * k)}%.4f")
        for (refine <- Seq(2, 4, 8)) {
          val ref = pipeline.Ann.ivfPqRefineTopK(idx, corpus, queries, k,
            nprobe = nprobe, refine = refine)
          val rhits = ref.join(exact, Seq("i", "j"), "left_semi").count()
          println(f"SWEEP $dir n=$n nlist=$nlist nprobe=$nprobe refine=$refine recall@$k = ${rhits.toDouble / (100 * k)}%.4f")
        }
        idx.release()
      }
    } finally spark.stop()
  }
}
