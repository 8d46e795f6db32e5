package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** Bucketed layout ⇒ exchange-free co-located join — the on-disk
  * partitioning claim of `Bucketing`, pinned on the physical plan. */
class BucketingSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  "a bucketed-by-key join" should "plan with no Exchange and match the plain join" in {
    val s = spark
    import s.implicits._
    val n = 5000
    val left = s.range(n).select(col("id").as("k"), (col("id") % 97).as("a"))
    val right = s.range(n).select(col("id").as("k"), (col("id") % 31).as("b"))

    try {
      Bucketing.writeBucketed(left, "bkt_left", "k", buckets = 8)
      Bucketing.writeBucketed(right, "bkt_right", "k", buckets = 8)

      // small test tables would be broadcast-joined (which bypasses the
      // bucket layout entirely); disable that to exercise the shape a
      // fact-to-fact join takes at scale, where neither side broadcasts
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(s, "bkt_left", "bkt_right", "k")
      joined.collect().length shouldBe n
      val plan = joined.queryExecution.executedPlan.toString
      // the whole point: the join's distribution requirement is satisfied
      // by the on-disk bucket layout — no shuffle, no per-side sort
      plan should include("SortMergeJoin")
      plan should not include "Exchange"
      plan should include("Bucketed: true")

      // and it is still the same join result
      val expected = left.join(right, "k")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      joined.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet shouldBe expected
    } finally {
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.sql("DROP TABLE IF EXISTS bkt_left")
      s.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  "bucketedJoin" should "reject mismatched bucket layouts instead of silently re-shuffling" in {
    val s = spark
    import s.implicits._
    try {
      Bucketing.writeBucketed(
        s.range(100).select(col("id").as("k")), "bkt_a8", "k", buckets = 8)
      Bucketing.writeBucketed(
        s.range(100).select(col("id").as("k")), "bkt_b4", "k", buckets = 4)
      val ex = intercept[IllegalArgumentException] {
        Bucketing.bucketedJoin(s, "bkt_a8", "bkt_b4", "k")
      }
      ex.getMessage should include("bucket counts differ")
      // and a plain (unbucketed) table is rejected too
      s.range(10).select(col("id").as("k")).write
        .mode("overwrite").saveAsTable("bkt_plain")
      intercept[IllegalArgumentException] {
        Bucketing.bucketedJoin(s, "bkt_a8", "bkt_plain", "k")
      }.getMessage should include("not bucketed")
    } finally Seq("bkt_a8", "bkt_b4", "bkt_plain")
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
  }

  "sweepStaleTables" should "drop orphaned prefix dirs and keep registered tables" in {
    val s = spark
    import s.implicits._
    val warehouse = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"))
    val fs = warehouse.getFileSystem(s.sessionState.newHadoopConf())
    try {
      // a live table of this session (registered in the catalog)…
      Bucketing.writeBucketed(
        s.range(100).select(col("id").as("k")), "bq_live", "k", buckets = 2)
      // …and an orphan directory as a dead session leaves it: data on disk,
      // no catalog entry
      fs.mkdirs(new org.apache.hadoop.fs.Path(warehouse, "bq_orphan"))
      // plus an unrelated dir that must never be touched
      fs.mkdirs(new org.apache.hadoop.fs.Path(warehouse, "other_dir"))

      Bucketing.sweepStaleTables(s)

      fs.exists(new org.apache.hadoop.fs.Path(warehouse, "bq_orphan")) shouldBe false
      fs.exists(new org.apache.hadoop.fs.Path(warehouse, "bq_live")) shouldBe true
      fs.exists(new org.apache.hadoop.fs.Path(warehouse, "other_dir")) shouldBe true
      s.table("bq_live").count() shouldBe 100L
    } finally {
      s.sql("DROP TABLE IF EXISTS bq_live")
      fs.delete(new org.apache.hadoop.fs.Path(warehouse, "other_dir"), true)
    }
  }
}
