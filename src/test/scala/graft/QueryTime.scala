package graft

import org.apache.spark.sql.SparkSession

/** One-off: time named queries under the Bench methodology (full
  * materialization, cache cleared, min of 2) at an arbitrary SF dir.
  * `sbt 'Test/runMain graft.QueryTime /root/testdata/sf0.1 q_dedup_clusters'` */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder().appName("query-time").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try args.tail.foreach { q =>
      val times = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QTIME $q run1=${times(0)}%.2f run2=${times(1)}%.2f")
    } finally spark.stop()
  }
}
