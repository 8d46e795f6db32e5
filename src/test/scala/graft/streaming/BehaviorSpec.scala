package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** Retention cohorts and daily path mining against hand-built event
  * fixtures (UTC session timezone pinned by SparkTestBase). */
class BehaviorSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private lazy val s = spark

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:00:00")

  private def ev(rows: Seq[(Long, Long, Timestamp, String)]) = {
    import s.implicits._
    rows.toDF("event_id", "user_id", "ts", "event_type")
  }

  behavior of "Events.retentionCohorts"

  it should "bucket users by first day and count per offset" in {
    val events = ev(Seq(
      // user 1: first day 1, returns day 2 and day 4 (twice in one day)
      (1L, 1L, ts(1), "view"), (2L, 1L, ts(2), "view"),
      (3L, 1L, ts(4), "view"), (4L, 1L, ts(4, 5), "click"),
      // user 2: first day 1 only
      (5L, 2L, ts(1, 9), "view"),
      // user 3: first day 2, returns day 3
      (6L, 3L, ts(2), "view"), (7L, 3L, ts(3), "view")))
    val got = Events.retentionCohorts(events)
      .orderBy("cohort_day", "offset_days")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got shouldBe Array(
      ("2024-03-01", 0L, 2L), // users 1 and 2 on their cohort day
      ("2024-03-01", 1L, 1L), // user 1 back next day
      ("2024-03-01", 3L, 1L), // user 1 back on day 4 — counted ONCE
      ("2024-03-02", 0L, 1L), // user 3 cohort
      ("2024-03-02", 1L, 1L)) // user 3 back
  }

  behavior of "Events.dailyPaths"

  it should "build event-time-ordered paths per user-day and count them" in {
    val events = ev(Seq(
      (1L, 1L, ts(1, 1), "view"), (2L, 1L, ts(1, 2), "click"),
      // same path for user 2 on another day, out-of-order event ids
      (9L, 2L, ts(3, 8), "click"), (8L, 2L, ts(3, 7), "view"),
      // a different path (single event)
      (5L, 3L, ts(1, 4), "view")))
    val got = Events.dailyPaths(events)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("view>click" -> 2L, "view" -> 1L)
  }

  it should "break event-time ties by event_id" in {
    val events = ev(Seq(
      (2L, 1L, ts(1, 3), "b"), (1L, 1L, ts(1, 3), "a")))
    Events.dailyPaths(events).collect()
      .map(_.getString(0)) shouldBe Array("a>b")
  }
}
