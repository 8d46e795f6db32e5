package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection tool: print the formatted physical plan of named
  * SparkEntry queries (post-execution, so AQE's final plan is shown).
  * `sbt 'Test/runMain graft.PlanDump /root/testdata/sf0.001 q_name...'`
  *
  * Optional first arg `--out=DIR[:SUFFIX]` additionally writes each query's
  * `.explain("formatted")` output to `DIR/<query>_<SUFFIX>.txt` (suffix
  * defaults to `before`) — the round's plan-evidence artifacts. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (outSpec, rest) = args.partition(_.startsWith("--out="))
    val outDirSuffix = outSpec.headOption.map { s =>
      s.stripPrefix("--out=").split(':') match {
        case Array(d) => (d, "before")
        case Array(d, suf) => (d, suf)
      }
    }
    val dir = rest.head
    val spark = SparkSession.builder().appName("plan-dump").master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try rest.tail.foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      // formatted mode: numbered operators + per-operator details
      // (PushedFilters, ReadSchema, join type/build side, partitioning)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // post-execution physical tree: with AQE the final plan (what ran)
      val finalPlan = df.queryExecution.executedPlan.toString
      println(s"===== $q =====")
      println(formatted)
      outDirSuffix.foreach { case (od, suf) =>
        val d = new java.io.File(od)
        d.mkdirs()
        val w = new java.io.PrintWriter(s"$od/${q}_$suf.txt", "UTF-8")
        try {
          w.println(s"== $q — explain(formatted), initial plan ==")
          w.println(formatted)
          w.println(s"== $q — executed plan after AQE (post-run) ==")
          w.println(finalPlan)
        } finally w.close()
      }
      spark.catalog.clearCache()
    } finally spark.stop()
  }
}
