package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.tsne.SparkTestBase

/** Funnel telescoping, NULL-gate semantics, and datacard aggregates vs
  * by-hand numbers. */
class AuditSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  "filterFunnel" should "telescope entered/kept across stages" in {
    val s = spark
    import s.implicits._
    // x: passes g1 iff x >= 2; passes g2 iff x % 2 == 0
    val df = Seq(1, 2, 3, 4, 5, 6).toDF("x")
    val out = Audit.filterFunnel(df, Seq(
      "ge2" -> (col("x") >= 2),
      "even" -> (col("x") % 2 === 0)))
      .orderBy("stage_idx").collect()
    out.map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))) shouldBe
      Seq(("ge2", 6L, 5L, 1L), ("even", 5L, 3L, 2L))
    // the last stage's kept equals the sequential where-chain count
    df.where(col("x") >= 2).where(col("x") % 2 === 0).count() shouldBe 3L
  }

  it should "count a NULL gate value as a drop, not a pass" in {
    val s = spark
    import s.implicits._
    val df = Seq(Some(1), None, Some(3)).toDF("x")
    val out = Audit.filterFunnel(df, Seq("notnull_gt0" -> (col("x") > 0)))
      .collect()
    out.head.getLong(2) shouldBe 3L // entered
    out.head.getLong(3) shouldBe 2L // kept: the NULL row must not pass
  }

  it should "be a single-aggregation plan (no per-stage jobs)" in {
    val s = spark
    import s.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    val funnel = Audit.filterFunnel(df, Seq(
      "a" -> (col("x") > 0), "b" -> (col("x") > 1), "c" -> (col("x") > 2)))
    funnel.collect()
    // exactly ONE logical aggregation, however many stages are declared
    // (the physical plan doubles nodes under AQE's initial/final dump, so
    // the pin is on the optimized logical plan)
    funnel.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    } should have size 1
  }

  "datacard" should "match by-hand group stats (even-count median interpolates)" in {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the cat sat", "en", "web", 11L),
      (2L, "the dog ran", "en", "web", 13L),
      (3L, "und der hund", "de", "web", 12L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Audit.datacard(docs).orderBy("lang").collect()
    val en = rows.find(_.getAs[String]("lang") == "en").get
    en.getAs[Long]("n_docs") shouldBe 2L
    en.getAs[Long]("n_tokens") shouldBe 6L
    // even count: median interpolates between 11 and 13
    en.getAs[Double]("median_chars_r") shouldBe 12.0
    en.getAs[Long]("max_chars") shouldBe 13L
    val de = rows.find(_.getAs[String]("lang") == "de").get
    de.getAs[Long]("n_docs") shouldBe 1L
    de.getAs[Double]("median_chars_r") shouldBe 12.0
  }

  "profile" should "count rows, NULLs and exact distincts per column" in {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None),
      (Some(2L), Some("b")), (None, Some("b"))
    ).toDF("id", "tag")
    val got = Audit.profile(df, Seq("id", "tag")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    got("id") shouldBe ((4L, 1L, 2L))  // NULL not counted as distinct
    got("tag") shouldBe ((4L, 1L, 2L))
  }

  it should "stay one aggregation statement and reject unknown columns" in {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a")).toDF("id", "tag")
    // one Aggregate family (Spark splits multi-distinct via Expand — the
    // point is one STATEMENT/one scan, not per-column jobs)
    Audit.profile(df, Seq("id", "tag")).queryExecution.optimizedPlan.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e
    } should have size 1
    an[IllegalArgumentException] should be thrownBy
      Audit.profile(df, Seq("nope"))
  }

  "histogram" should "bin with edge clamping and drop NULLs" in {
    val s = spark
    import s.implicits._
    val df = Seq(Some(-5L), Some(0L), Some(9L), Some(10L), Some(25L),
      Some(99L), Some(100L), Some(777L), None).toDF("v")
    // 10 bins over [0, 100): width 10; -5 clamps into bin 0, 100 and 777
    // clamp into bin 9
    val got = Audit.histogram(df, "v", nBins = 10, lo = 0L, hi = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(0L -> 3L, 1L -> 1L, 2L -> 1L, 9L -> 3L)
    got.values.sum shouldBe 8L // every non-NULL row accounted for
  }

  "Audit.tableChecksum" should "localize a single-row change to exactly one bucket" in {
    val s = spark
    import s.implicits._
    val base = (1L to 200L).map(i => (i, s"text-$i", i % 7))
      .toDF("doc_id", "text", "v")
    def sums(df: org.apache.spark.sql.DataFrame) =
      Audit.tableChecksum(df, "doc_id", Seq("doc_id", "text", "v"), 16)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
    val a = sums(base)
    // identical copy, different partitioning → identical checksums
    sums(base.repartition(7)) shouldBe a
    // mutate one row's content → same counts, exactly ONE bucket xor flips
    val mutated = base.withColumn("text",
      when(col("doc_id") === 57L, lit("tampered")).otherwise(col("text")))
    val b = sums(mutated)
    b.keySet shouldBe a.keySet
    a.map(_._2._1).sum shouldBe 200L
    val diff = a.keySet.filter(k => a(k) != b(k))
    diff.size shouldBe 1
    // and the differing bucket differs in xor, not count
    a(diff.head)._1 shouldBe b(diff.head)._1
    // a DELETED row flips a count, not just a hash
    val dropped = sums(base.where(col("doc_id") =!= 57L))
    dropped(diff.head)._1 shouldBe a(diff.head)._1 - 1
  }

  "Sketches.hllWeeklyRollup" should "merge daily sketches to in-tolerance weekly estimates" in {
    val s = spark
    import s.implicits._
    // 3 weeks of events: user u active on day d
    val rows = for (d <- 0 until 21; u <- 0 until (50 + d)) yield
      (java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"), u.toLong)
    val events = rows.toDF("ts", "user_id")
    val got = graft.ops.Sketches.hllWeeklyRollup(events, "user_id", tol = 0.05)
      .orderBy("week")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.length shouldBe 3 // Jan 1 2024 is a Monday: days 1-21 = 3 ISO weeks
    got.foreach { case (_, nExact, ok) => ok shouldBe 1L }
    // weekly distinct = max users of any day in that week (nested actives)
    got.head._2 shouldBe 56L // days 0..6 → 50+6 = 56 distinct users
  }

  "Sketches.kllWeeklyQuantileRollup" should "merge daily quantile sketches within the rank tolerance" in {
    val s = spark
    import s.implicits._
    // 2 weeks, values skewed differently by week so a wrong merge (e.g.
    // one week's sketch reused for the other) lands far outside 3%
    val rows = for (d <- 0 until 14; i <- 0 until 500) yield
      (java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"),
        if (d < 7) (i * 37 % 500).toDouble else (i * 37 % 500) * 10.0)
    val events = rows.toDF("ts", "value")
    val got = graft.ops.Sketches.kllWeeklyQuantileRollup(events, "value",
      qs = Seq(0.5, 0.9, 0.99)).orderBy("week")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.length shouldBe 2
    got.foreach { case (_, n, ok) =>
      n shouldBe 3500L
      ok shouldBe 1L
    }
  }

  it should "fail the contract for an out-of-tolerance estimate" in {
    val s = spark
    import s.implicits._
    // sanity of the checker itself: shrink the tolerance to ~0 and feed a
    // distinct-valued column — the sketch's real rank error (≈1.65% at
    // k=200 over 20k distinct values) must now trip at least one rank
    val rows = (0 until 14).flatMap(d => (0 until 2000).map(i =>
      (java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"),
        (d * 2000 + i) * 997.0 % 28000)))
    val events = rows.toDF("ts", "value")
    val ok = graft.ops.Sketches.kllWeeklyQuantileRollup(events, "value",
      qs = Seq(0.1, 0.3, 0.5, 0.7, 0.9), rankTol = 1e-6)
      .agg(min("ok")).head.getLong(0)
    ok shouldBe 0L
  }

  "Sketches.thetaPairOverlap" should "estimate pairwise overlaps within tolerance, exact sets aside" in {
    val s = spark
    import s.implicits._
    // groups with engineered overlaps: a∩b = 500, a∩c = 0, b∩c = 100
    val rows =
      (0 until 1000).map(u => ("a", u.toLong)) ++
        (500 until 1500).map(u => ("b", u.toLong)) ++
        (1400 until 1600).map(u => ("c", u.toLong)) ++
        // duplicate memberships must not inflate anything
        (0 until 200).map(u => ("a", u.toLong))
    val got = graft.ops.Sketches.thetaPairOverlap(
      rows.toDF("g", "u"), "g", "u").orderBy("g_a", "g_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    got shouldBe Array(
      ("a", "b", 1000L, 1000L, 500L, 1L),
      ("a", "c", 1000L, 200L, 0L, 1L),
      ("b", "c", 1000L, 200L, 100L, 1L))
  }
}
