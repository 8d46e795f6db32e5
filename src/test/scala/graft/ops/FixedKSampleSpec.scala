package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** Fixed-count per-stratum sampling: exact cardinality, reproducible
  * membership, displacement-only growth, and partitioning invariance. */
class FixedKSampleSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private lazy val s = spark

  private def corpus(n: Int) = {
    import s.implicits._
    (0 until n).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "src")
  }

  behavior of "Sampling.fixedKPerStratum"

  it should "take exactly min(k, |stratum|) rows per stratum" in {
    val df = corpus(103) // strata sizes 26, 26, 26, 25
    val got = Sampling.fixedKPerStratum(df, "id", "src", k = 7)
      .groupBy("src").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("s0" -> 7L, "s1" -> 7L, "s2" -> 7L, "s3" -> 7L)
    // k larger than a stratum: the whole stratum, ranked
    val tiny = corpus(6) // strata of 1-2 rows
    Sampling.fixedKPerStratum(tiny, "id", "src", k = 7).count() shouldBe 6L
  }

  it should "be invariant to input partitioning" in {
    val df = corpus(200)
    val a = Sampling.fixedKPerStratum(df, "id", "src", 5)
      .select("id", "sample_rank").collect().toSet
    val b = Sampling.fixedKPerStratum(df.repartition(13), "id", "src", 5)
      .select("id", "sample_rank").collect().toSet
    a shouldBe b
  }

  it should "only displace, never reshuffle, when a stratum grows" in {
    val small = corpus(100)
    val grown = corpus(200) // same first 100 rows plus 100 more
    val kept = Sampling.fixedKPerStratum(small, "id", "src", 5)
      .select("id").collect().map(_.getLong(0)).toSet
    val after = Sampling.fixedKPerStratum(grown, "id", "src", 5)
      .select("id").collect().map(_.getLong(0)).toSet
    // every selected id that survived is one of the originals or a new row
    // ranked ahead of it — i.e. originals can only be pushed out by new
    // ids, and the still-present originals keep their relative hash order
    val stillRanked = Sampling.fixedKPerStratum(grown, "id", "src", 5)
      .where(col("id") < 100).select("id").collect().map(_.getLong(0)).toSet
    stillRanked.subsetOf(kept) shouldBe true
    after.size shouldBe 20
  }

  it should "match the plain window spelling row-for-row" in {
    import graft.pipeline.Hashing
    val df = corpus(150)
    val h = Hashing.hash60(concat(col("id").cast("string"), lit("#fixedk")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(h.asc, col("id").asc)
    val plain = df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= 4)
      .select("id", "sample_rank").collect().toSet
    val got = Sampling.fixedKPerStratum(df, "id", "src", 4)
      .select("id", "sample_rank").collect().toSet
    got shouldBe plain
  }
}
