package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: measure SQ8 recall@10 vs exact on the fixture embeddings. */
object SqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("sq-probe").master("local[16]")
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
      val idx = pipeline.Ann.sqBuild(corpus)
      val approx = pipeline.Ann.sqTopK(idx, queries, k)
      val hits = approx.join(exact, Seq("i", "j"), "left_semi").count()
      val n = queries.count()
      println(f"RECALL $dir sq8 recall@$k = ${hits.toDouble / (n * k)}%.4f (hits=$hits n=$n)")
      idx.release()
    } finally spark.stop()
  }
}
