package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: print the learned WordPiece vocab and a few word
  * segmentations for cross-checking against the DuckDB oracle. */
object WpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")
    val vocab = Wordpiece.learnVocab(docs, k = 24, maxLen = 6)
    println("SPARK_VOCAB " + vocab.sorted.mkString(","))
    // per-word dump: one doc per DISTINCT word, so n_wp_tokens = n_sub
    import spark.implicits._
    val words = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .distinct().as[String].collect().sorted.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toSeq
    val wordsDf = spark.createDataFrame(words).toDF("doc_id", "text")
    Wordpiece.segment(wordsDf, vocab).orderBy("doc_id").collect()
      .zip(words).foreach { case (r, (_, w)) =>
        println(s"SPARK_WORD\t$w\t${r.getLong(2)}\t${r.getLong(3)}") }
    spark.stop()
  }
}
