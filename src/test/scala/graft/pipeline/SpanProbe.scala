package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off stage profiler for Dedup.sharedSpanPairs at an SF dir.
  * `sbt 'Test/runMain graft.pipeline.SpanProbe /root/testdata/sf0.1'` */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder().appName("span-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val (minLen, gramWidth) = (40, 32)
    val k = minLen - gramWidth + 1
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val txt = docs.select(col("doc_id"), col("text"))
      .where(col("text").isNotNull && length(col("text")) >= gramWidth)
    val hIdxs = sequence(lit(0), length(col("text")) - gramWidth)
    val hashes = txt.select(col("doc_id"),
      posexplode(transform(hIdxs,
        i => Hashing.hash60(col("text").substr(i + 1, lit(gramWidth)))))
        .as(Seq("pos", "h")))
    println("PROBE hash-rows " + timed("hashes")(hashes.count()))
    val hck = timed("hash-ckpt")(hashes.localCheckpoint())
    val win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, k - 1)
    val anchors = hck
      .select(col("doc_id"), min(col("h")).over(win).as("fp")).distinct()
    println("PROBE anchor-rows " + timed("anchors")(anchors.count()))
    val ack = timed("anchor-ckpt")(anchors.localCheckpoint())
    val fpDf = anchors.groupBy("fp").agg(count(lit(1)).as("df"))
    println("PROBE hot-fps " + timed("fp-df")(
      fpDf.orderBy(col("df").desc).limit(5).collect().mkString(" ")))
    val cands = ack.as("a").join(ack.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
    println("PROBE cand-rows " + timed("cand-rows")(cands.count()))
    val candsD = cands.distinct()
    println("PROBE cand-pairs " + timed("cand-pairs")(candsD.count()))
    val candIds = candsD.select(col("i").as("doc_id"))
      .unionByName(candsD.select(col("j").as("doc_id"))).distinct()
    println("PROBE cand-docs " + timed("cand-docs")(candIds.count()))
    spark.stop()
  }
}
