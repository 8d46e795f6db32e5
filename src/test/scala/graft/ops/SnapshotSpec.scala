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
}
