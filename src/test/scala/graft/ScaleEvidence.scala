package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synthetic past-sf0.1 scale evidence (the driver fixtures stop at sf0.1;
  * VERDICT r3 "what's missing" #3): replicate the sf0.1 tables with shifted
  * keys to ×2 and ×8, run the core relational + curation shapes at both
  * sizes, and print rows + seconds — a ×4 data ratio at ~×4 time is the
  * linear-scaling check. Results recorded in SCALE.md.
  * `sbt 'Test/runMain graft.ScaleEvidence'` */
object ScaleEvidence {

  private def replicate(df: DataFrame, copies: Int, keyCols: Seq[String],
                        shift: Long): DataFrame =
    (0 until copies).map { k =>
      keyCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(k * shift)))
    }.reduce(_ union _)

  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().appName("scale-evidence")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // min of 2 like Bench: strips JIT warm-up and stray GC stalls
    def time(f: => Long): (Long, Double) = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f; (n, (System.nanoTime() - t0) / 1e9)
      }
      (runs.head._1, runs.map(_._2).min)
    }
    try {
      for (copies <- Seq(2, 8)) {
        val li = replicate(spark.read.parquet(s"$sf/lineitem.parquet"),
          copies, Seq("l_orderkey"), 100000000L).cache()
        val ord = replicate(spark.read.parquet(s"$sf/orders.parquet"),
          copies, Seq("o_orderkey", "o_custkey"), 100000000L).cache()
        val docs = replicate(spark.read.parquet(s"$sf/documents.parquet"),
          copies, Seq("doc_id"), 100000000L).cache()
        li.count(); ord.count(); docs.count()

        val (aggN, aggT) = time(li.groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity"), sum("l_extendedprice"), count(lit(1))).count())
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val (topkN, topkT) = time(ord.withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3).count())
        val (joinN, joinT) = time(ord.join(li,
          col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_custkey").agg(sum("l_extendedprice")).count())
        val (dedupN, dedupT) = time(pipeline.Dedup.exactCanonical(docs).count())
        val (repN, repT) = time(pipeline.TextOps.repetitionSignals(docs).count())
        val bench = spark.read.parquet(s"$sf/documents.parquet")
          .where(col("doc_id") % 37 === 0)
        val (decN, decT) = time(pipeline.TextOps.decontaminate(docs, bench).count())

        println(f"SCALEEV copies=$copies lineitem=${li.count()} " +
          f"agg=$aggT%.2f($aggN) topk=$topkT%.2f($topkN) joinagg=$joinT%.2f($joinN) " +
          f"dedup=$dedupT%.2f($dedupN) repetition=$repT%.2f($repN) decontam=$decT%.2f($decN)")
        li.unpersist(); ord.unpersist(); docs.unpersist()
      }
    } finally spark.stop()
  }
}
