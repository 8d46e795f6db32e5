package graft

import org.apache.spark.sql.SparkSession

/** One-off: dump executed plans for named queries (plan auditing). 
  * `sbt 'Test/runMain graft.PlanDump q_decontaminate q_text_repetition'` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("plan-dump").master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try args.foreach { q =>
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      df.collect()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Aggregate") || l.contains("Scan") || l.contains("Window"))
        .mkString("\n"))
    } finally spark.stop()
  }
}
