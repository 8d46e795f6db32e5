package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** AQE's runtime skew-join handling — the complement to the static salting
  * shapes in [[Skew]]: when a sort-merge join partition is detected as
  * skewed at runtime, AQE splits it into sub-partitions and replicates the
  * matching side, so one hot key cannot pin a whole stage on one task.
  * Pinned here so a config/refactor can't silently turn it off. */
class AqeSkewSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  "AQE" should "split a skewed join partition at runtime" in {
    val s = spark
    // one mega-key (~80% of all rows) + a uniform tail
    val left = s.range(400000)
      .select(when(col("id") < 320000, 7L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val right = s.range(1000).select(col("id").as("k"), (col("id") * 2).as("v"))

    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> s.conf.getOption("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        s.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        s.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        s.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionFactor"))
    try {
      // force a sort-merge join and thresholds small enough that the test
      // data's hot partition counts as skewed
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")

      // drive the SAME DataFrame whose queryExecution we inspect (count()
      // would plan a separate query); only the hot key matches
      val joined = left.join(right, "k")
      joined.collect().length shouldBe 320000
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      // AQE marks the rewritten join node
      plan should include("skew=true")
    } finally prev.foreach {
      case (key, Some(v)) => s.conf.set(key, v)
      case (key, None) => s.conf.unset(key)
    }
  }
}
