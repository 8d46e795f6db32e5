package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: measure IVF-PQ ADC recall@10 vs exact on the fixture
  * embeddings for a sweep of (nlist, nprobe) configs.
  * `sbt 'Test/runMain graft.RecallProbe <sfDir> [nlist:nprobe ...]'` */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("recall-probe").master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.head
    val configs =
      if (args.length > 1) args.tail.toSeq.map { s =>
        s.split(':') match {
          case Array(a, b) => (a.toInt, b.toInt, 32, 64)
          case Array(a, b, m, ks) => (a.toInt, b.toInt, m.toInt, ks.toInt)
        }
      } else Seq((16, 10, 32, 64))
    try {
      val k = 10
      val corpus = graft.tsne.IO.readEmbeddings(spark, dir)
      val queries = corpus.filter(col("id") < 100)
      val exact = pipeline.Ann.bruteTopK(corpus, queries, k).select("i", "j")
        .localCheckpoint()
      val n = queries.count()
      configs.foreach { case (nlist, nprobe, m, ksub) =>
        val t0 = System.nanoTime()
        val idx = pipeline.Ann.ivfPqBuild(corpus, nlist = nlist, m = m,
          ksub = ksub, iters = 5, seed = 42L)
        val approx = pipeline.Ann.ivfPqTopK(idx, queries, k, nprobe = nprobe)
        val hits = approx.join(exact, Seq("i", "j"), "left_semi").count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"RECALL $dir nlist=$nlist nprobe=$nprobe m=$m ksub=$ksub recall@$k = ${hits.toDouble / (n * k)}%.4f (hits=$hits n=$n, ${dt}%.1f s)")
        idx.release()
      }
    } finally spark.stop()
  }
}
