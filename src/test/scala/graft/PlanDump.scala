package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection tool: print the formatted physical plan of named
  * SparkEntry queries (post-execution, so AQE's final plan is shown).
  * `sbt 'Test/runMain graft.PlanDump /root/testdata/sf0.001 q_name...'` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder().appName("plan-dump").master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try args.tail.foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString)
    } finally spark.stop()
  }
}
