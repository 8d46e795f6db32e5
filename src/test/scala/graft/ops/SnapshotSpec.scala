package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** CDC snapshot maintenance: diff classification semantics (null-safe,
  * per-column), the apply round-trip identity, and the loud-failure
  * contracts. */
class SnapshotSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private lazy val s = spark

  private def snap(rows: Seq[(Long, String, Option[Long])]) = {
    import s.implicits._
    rows.toDF("id", "body", "meta")
  }

  behavior of "Snapshot.diff"

  it should "classify insert, delete, update and drop unchanged" in {
    val old = snap(Seq((1L, "a", Some(10L)), (2L, "b", Some(20L)),
      (3L, "c", Some(30L)), (4L, "d", None)))
    val neu = snap(Seq((2L, "b", Some(20L)), // unchanged
      (3L, "c2", Some(30L)),                 // update (body)
      (4L, "d", Some(40L)),                  // update (NULL -> value)
      (5L, "e", Some(50L))))                 // insert; 1 deleted
    val got = Snapshot.diff(old, neu, "id", Seq("body", "meta"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    got shouldBe Array(
      (1L, "delete", "a"),
      (3L, "update", "c2"),
      (4L, "update", "d"),
      (5L, "insert", "e"))
  }

  it should "not call NULL == NULL a change" in {
    val old = snap(Seq((1L, "a", None)))
    val neu = snap(Seq((1L, "a", None)))
    Snapshot.diff(old, neu, "id", Seq("body", "meta")).count() shouldBe 0L
  }

  it should "carry the OLD payload on deletes and the NEW on updates" in {
    val old = snap(Seq((1L, "gone", Some(1L)), (2L, "was", Some(2L))))
    val neu = snap(Seq((2L, "now", Some(2L))))
    val rows = Snapshot.diff(old, neu, "id", Seq("body", "meta"))
      .orderBy("id").collect()
    rows.map(_.getString(2)) shouldBe Array("gone", "now")
  }

  behavior of "Snapshot.applyChanges"

  it should "round-trip: snapshot + diff(snapshot, new) == new" in {
    val old = snap(Seq((1L, "a", Some(10L)), (2L, "b", Some(20L)),
      (3L, "c", Some(30L)), (7L, "g", None)))
    val neu = snap(Seq((2L, "b", Some(20L)), (3L, "c9", Some(31L)),
      (7L, "g", None), (9L, "i", Some(90L))))
    val changes = Snapshot.diff(old, neu, "id", Seq("body", "meta"))
    val applied = Snapshot.applyChanges(old, changes, "id")
    // symmetric difference empty = exact set equality
    applied.exceptAll(neu).count() shouldBe 0L
    neu.exceptAll(applied).count() shouldBe 0L
    // and a second diff over the applied snapshot is empty
    Snapshot.diff(applied, neu, "id", Seq("body", "meta")).count() shouldBe 0L
  }

  it should "fail loudly on a malformed change kind" in {
    val old = snap(Seq((1L, "a", Some(10L))))
    val bad = snap(Seq((2L, "x", Some(2L))))
      .withColumn("change", lit("upsert"))
    val ex = intercept[Exception] {
      Snapshot.applyChanges(old, bad, "id").collect()
    }
    ex.getMessage should include("bad change kind")
  }

  it should "reject a changeset missing snapshot columns" in {
    val old = snap(Seq((1L, "a", Some(10L))))
    val narrow = old.select("id").withColumn("change", lit("delete"))
    an[IllegalArgumentException] should be thrownBy
      Snapshot.applyChanges(old, narrow, "id")
  }

  behavior of "Snapshot.incrementalCountSum"

  private def corpus(rows: Seq[(Long, String, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "g", "v")
  }

  private def aggOf(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("s"))

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  it should "match a full recompute across inserts, deletes and group moves" in {
    val old = corpus(Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "c", 5L)))
    val neu = corpus(Seq(
      (1L, "a", 10L),            // unchanged
      (2L, "b", 21L),            // MOVES a→b (and value changes)
      (4L, "c", 5L),             // unchanged
      (5L, "d", 7L)))            // insert into a NEW group; id 3 deleted
    val changes = Snapshot.diffWithOld(old, neu, "id", Seq("g", "v"))
    val got = asMap(Snapshot.incrementalCountSum(
      aggOf(old), changes, Seq("g"), "v"))
    got shouldBe asMap(aggOf(neu))
    // and the emptied group is genuinely gone, the new one present
    got.contains("d") shouldBe true
    got("a") shouldBe ((1L, 10L))
  }

  it should "equal the direct aggregate on random change mixes" in {
    val rnd = new scala.util.Random(17)
    val old = corpus((1L to 300L).map(i =>
      (i, s"g${rnd.nextInt(6)}", rnd.nextInt(100).toLong)))
    // new corpus: drop ~20%, mutate ~30% (half of those move groups),
    // add 60 fresh rows
    val neu = corpus(((1L to 300L).flatMap { i =>
      val r = rnd.nextInt(10)
      if (r < 2) None
      else if (r < 5) Some((i, s"g${rnd.nextInt(6)}", rnd.nextInt(100).toLong))
      else Some((i, s"g${(i % 6)}", (i * 7 % 100)))
    } ++ (301L to 360L).map(i =>
      (i, s"g${rnd.nextInt(6)}", rnd.nextInt(100).toLong))))
    val changes = Snapshot.diffWithOld(old, neu, "id", Seq("g", "v"))
    val got = asMap(Snapshot.incrementalCountSum(
      aggOf(old), changes, Seq("g"), "v"))
    got shouldBe asMap(aggOf(neu))
  }
}
