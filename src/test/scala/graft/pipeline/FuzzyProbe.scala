package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profiler for FuzzyJoin at an SF dir (test scope, not part
  * of the library): counts candidates and times the stage boundaries.
  * `sbt 'Test/runMain graft.pipeline.FuzzyProbe /root/testdata/sf0.1'` */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder().appName("fuzzy-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val keyed = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), substring(col("text"), 1, 64).as("key"))
    timed("full")(FuzzyJoin.editDistanceJoin(keyed, "doc_id", "key", 4, 4).count())

    // stage decomposition (mirrors the operator internals)
    val q = 4; val d = 4
    val keys = keyed.select(col("doc_id").cast("long").as("id"), col("key"))
      .where(col("key").isNotNull).withColumn("len", length(col("key")))
    val longKeys = keys.where(col("len") >= q * (d + 1))
    val idxs = sequence(lit(0), col("len") - q)
    val grams = longKeys.select(col("id"), col("len"),
      posexplode(transform(idxs, i => col("key").substr(i + 1, lit(q))))
        .as(Seq("pos", "gram")))
    println("PROBE grams " + timed("grams-count")(grams.count()))
    val df_ = grams.groupBy("gram").agg(count(lit(1)).as("df"))
    println("PROBE distinct-grams " + timed("df-count")(df_.count()))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df"), col("gram"), col("pos"))
    val prefix = grams.join(df_, "gram")
      .withColumn("rn", row_number().over(w)).where(col("rn") <= q * d + 1)
      .select("id", "gram", "pos", "len")
    println("PROBE prefix " + timed("prefix-count")(prefix.count()))
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id") &&
          abs(col("a.pos") - col("b.pos")) <= d &&
          abs(col("a.len") - col("b.len")) <= d)
      .select(col("a.id").as("i"), col("b.id").as("j"))
    println("PROBE cand-rows " + timed("cand-rows")(cands.count()))
    println("PROBE cand-pairs " + timed("cand-pairs")(cands.distinct().count()))
    spark.stop()
  }
}
