package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: wall-clock the distributed PQ / IVF-PQ query side at 1× / 10×
  * / 100× the driver contract's 100-query batch — the measurement behind
  * SCALE.md's "query side is distributed" row.
  * `sbt 'Test/runMain graft.PqBatchProbe <sfDir>'` */
object PqBatchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("pq-batch-probe")
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try args.foreach { dir =>
      val k = 10
      val corpus = graft.tsne.IO.readEmbeddings(spark, dir)
      val n = corpus.count()
      val dim = corpus.head().vec.length
      val pq = pipeline.Ann.pqBuild(corpus, m = 32, ksub = 64, iters = 5, seed = 42L)
      val ivfpq = pipeline.Ann.ivfPqBuild(corpus, nlist = 16, m = 32,
        ksub = 64, iters = 5, seed = 42L)
      for (q <- Seq(100, 1000, 10000)) {
        val rnd = new scala.util.Random(7)
        val queries = spark.createDataset(
          (0 until q).map(i => graft.tsne.Point(1000000L + i,
            Array.fill(dim)(rnd.nextGaussian())))).repartition(16)
        val parts = math.max(1, q / 2500)
        def time(label: String)(f: => Long): Unit = {
          val t0 = System.nanoTime()
          val rows = f
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"PQBATCH $dir n=$n q=$q parts=$parts $label rows=$rows ${sec}%.2f s")
        }
        time("pq")(pipeline.Ann.pqTopK(pq, queries, k, queryParts = parts).count())
        time("ivfpq")(pipeline.Ann.ivfPqTopK(ivfpq, queries, k, nprobe = 10,
          queryParts = parts).count())
      }
      pq.release(); ivfpq.release()
    } finally spark.stop()
  }
}
