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

  behavior of "Events.interarrivalQuantiles"

  it should "take exact nearest-rank gap values per type, same-type gaps only" in {
    // user 1 'view' at minutes 0, 10, 40 → gaps 10, 30 min; the 'click'
    // between them must NOT split the view gap
    val events = ev(Seq(
      (1L, 1L, ts(1, 0), "view"),
      (2L, 1L, Timestamp.valueOf("2024-03-01 00:10:00"), "view"),
      (3L, 1L, Timestamp.valueOf("2024-03-01 00:20:00"), "click"),
      (4L, 1L, Timestamp.valueOf("2024-03-01 00:40:00"), "view"),
      // user 2 'view' gap of 5 min
      (5L, 2L, ts(1, 1), "view"),
      (6L, 2L, Timestamp.valueOf("2024-03-01 01:05:00"), "view")))
    val got = Events.interarrivalQuantiles(events,
      Map("p50" -> ((50L, 100L)), "p100" -> ((100L, 100L))))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val min = 60L * 1000000
    // view gaps sorted: 5, 10, 30 → p50 = rank ceil(3/2)=2 → 10 min
    got(("view", "p50")) shouldBe 10 * min
    got(("view", "p100")) shouldBe 30 * min
    got.contains(("click", "p50")) shouldBe false // a single event has no gap
  }

  behavior of "Events.conversionLatencyQuantiles"

  it should "report exact per-transition latency quantiles" in {
    // user 1: view→click 10 min, click→purchase 20 min
    // user 2: view→click 30 min, never purchases
    val events = ev(Seq(
      (1L, 1L, ts(1, 0), "view"),
      (2L, 1L, Timestamp.valueOf("2024-03-01 00:10:00"), "click"),
      (3L, 1L, Timestamp.valueOf("2024-03-01 00:30:00"), "purchase"),
      (4L, 2L, ts(2, 0), "view"),
      (5L, 2L, Timestamp.valueOf("2024-03-02 00:30:00"), "click")))
    val got = Events.conversionLatencyQuantiles(events,
      Seq("view", "click", "purchase"), Map("p100" -> ((100L, 100L))))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val min = 60L * 1000000
    got(("view>click", "p100")) shouldBe 30 * min    // max of {10, 30}
    got(("click>purchase", "p100")) shouldBe 20 * min // only user 1
    got.size shouldBe 2
  }

  behavior of "Events.basketPairs"

  it should "count co-present pairs per user-day basket with exact lift" in {
    val events = ev(Seq(
      // user 1 day 1: {click, view} (duplicate view collapses)
      (1L, 1L, ts(1, 1), "view"), (2L, 1L, ts(1, 2), "click"),
      (3L, 1L, ts(1, 3), "view"),
      // user 1 day 2: {view} — no pair, but counts in marginals/total
      (4L, 1L, ts(2, 1), "view"),
      // user 2 day 1: {click, error, view}
      (5L, 2L, ts(1, 4), "click"), (6L, 2L, ts(1, 5), "view"),
      (7L, 2L, ts(1, 6), "error")))
    val got = Events.basketPairs(events, minSupport = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    // 3 baskets; marginals view=3, click=2, error=1
    got(("click", "view")) shouldBe ((2L, 2L, 3L, 3L, 1.0))
    got(("click", "error")) shouldBe ((1L, 2L, 1L, 3L, 1.5))
    got(("error", "view")) shouldBe ((1L, 1L, 3L, 3L, 1.0))
    got.size shouldBe 3
  }

  it should "enforce the support floor" in {
    val events = ev(Seq(
      (1L, 1L, ts(1), "a"), (2L, 1L, ts(1, 1), "b"),
      (3L, 2L, ts(1), "a"), (4L, 2L, ts(1, 1), "b"),
      (5L, 3L, ts(1), "a"), (6L, 3L, ts(1, 1), "c")))
    val got = Events.basketPairs(events, minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)))
    got shouldBe Array(("a", "b"))
  }

  behavior of "Events.rollingActiveUsers"

  it should "count trailing-window distinct users and cut past the last active day" in {
    val events = ev(Seq(
      (1L, 1L, ts(1), "view"), (2L, 1L, ts(3), "view"),
      (3L, 1L, ts(3, 5), "click"), // same user-day: dedup before fan-out
      (4L, 2L, ts(2), "view")))
    val got = Events.rollingActiveUsers(events, windowDays = 2)
      .orderBy("report_day")
      .collect().map(r => r.getDate(0).toString -> r.getLong(1))
    got shouldBe Array(
      "2024-03-01" -> 1L, // u1
      "2024-03-02" -> 2L, // u1 (from day 1) + u2
      "2024-03-03" -> 2L) // u1 + u2 (from day 2); day 4 cut at max day
  }

  behavior of "Events.funnel"

  private def us(t: Timestamp): Long = t.getTime * 1000L

  it should "require steps strictly in order — an early purchase does not count" in {
    val events = ev(Seq(
      // user 1 completes in order
      (1L, 1L, ts(1, 1), "view"), (2L, 1L, ts(1, 2), "click"),
      (3L, 1L, ts(1, 3), "purchase"),
      // user 2: purchase BEFORE the click — only view+click achieved
      (4L, 2L, ts(1, 1), "view"), (5L, 2L, ts(1, 2), "purchase"),
      (6L, 2L, ts(1, 3), "click"),
      // user 3: never views — enters no step even though click+purchase exist
      (7L, 3L, ts(1, 1), "click"), (8L, 3L, ts(1, 2), "purchase")))
    val got = Events.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("user_id", "step")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    got shouldBe Array(
      (1L, 1, "view", us(ts(1, 1))), (1L, 2, "click", us(ts(1, 2))),
      (1L, 3, "purchase", us(ts(1, 3))),
      (2L, 1, "view", us(ts(1, 1))), (2L, 2, "click", us(ts(1, 3))))
  }

  it should "take the FIRST qualifying event per step and exclude equal timestamps" in {
    val events = ev(Seq(
      // two views: first one wins
      (1L, 1L, ts(1, 1), "view"), (2L, 1L, ts(1, 5), "view"),
      // click at EXACTLY the view's ts is not strictly after → the 2nd counts
      (3L, 1L, ts(1, 1), "click"), (4L, 1L, ts(1, 4), "click")))
    val got = Events.funnel(events, Seq("view", "click"))
      .orderBy("step").collect()
      .map(r => (r.getInt(1), r.getLong(3)))
    got shouldBe Array((1, us(ts(1, 1))), (2, us(ts(1, 4))))
  }

  it should "match the N-pass conditional-min spelling on a random fixture" in {
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val types = Array("view", "click", "purchase", "other")
    val events = (1L to 600L).map(i =>
      (i, rnd.nextInt(25).toLong + 1L,
        new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
        types(rnd.nextInt(types.length))))
      .toDF("event_id", "user_id", "ts", "event_type")
      .persist()
    // reference: step k = min ts of its type strictly after step k-1
    val s1 = events.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = events.join(s1, "user_id")
      .where(col("event_type") === "click" && col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = events.join(s2, "user_id")
      .where(col("event_type") === "purchase" && col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    val expect =
      s1.select(col("user_id"), lit(1).as("step"), unix_micros(col("t1")).as("t_us"))
        .union(s2.select(col("user_id"), lit(2), unix_micros(col("t2"))))
        .union(s3.select(col("user_id"), lit(3), unix_micros(col("t3"))))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = Events.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3))).toSet
    got shouldBe expect
    events.unpersist()
  }

  behavior of "Events.timeWeightedAvg"

  it should "weigh each value by its holding duration" in {
    // v=2 held 10 min, v=4 held 20 min → twa = (2·10 + 4·20)/30 = 10/3
    val events = evv(Seq(
      (1L, 1L, ts(1, 0), "view", 2.0),
      (2L, 1L, Timestamp.valueOf("2024-03-01 00:10:00"), "view", 4.0),
      (3L, 1L, Timestamp.valueOf("2024-03-01 00:30:00"), "view", 9.9),
      // single-event user: no holding interval, no row
      (4L, 2L, ts(2), "view", 5.0)))
    val got = Events.timeWeightedAvg(events).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    got.keySet shouldBe Set(1L)
    got(1L)._1 shouldBe BigDecimal(10.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got(1L)._2 shouldBe 30L * 60 * 1000000
  }

  behavior of "Events.gapFillDaily"

  private def evv(rows: Seq[(Long, Long, Timestamp, String, Double)]) = {
    import s.implicits._
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")
  }

  it should "densify each user's day span and forward-fill missing days" in {
    val events = evv(Seq(
      // user 1: day 1 (two events), day 4 — days 2,3 filled from day 1
      (1L, 1L, ts(1, 1), "view", 2.0), (2L, 1L, ts(1, 9), "view", 3.0),
      (3L, 1L, ts(4, 2), "view", 10.0),
      // user 2: single day — spine is that one day
      (4L, 2L, ts(2, 5), "view", 7.0)))
    val got = Events.gapFillDaily(events)
      .orderBy("user_id", "day")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2),
        r.getBoolean(3)))
    got shouldBe Array(
      (1L, "2024-03-01", 5.0, true),
      (1L, "2024-03-02", 5.0, false),
      (1L, "2024-03-03", 5.0, false),
      (1L, "2024-03-04", 10.0, true),
      (2L, "2024-03-02", 7.0, true))
  }

  it should "never fill across users" in {
    val events = evv(Seq(
      (1L, 1L, ts(1), "view", 1.0), (2L, 1L, ts(3), "view", 2.0),
      (3L, 2L, ts(2), "view", 9.0), (4L, 2L, ts(4), "view", 8.0)))
    val byUser = Events.gapFillDaily(events).collect()
      .groupBy(_.getLong(0))
    // user 2's filled day-3 value comes from ITS day-2 value, not user 1's
    val u2 = byUser(2L).map(r => r.getDate(1).toString -> r.getDouble(2)).toMap
    u2 shouldBe Map("2024-03-02" -> 9.0, "2024-03-03" -> 9.0,
      "2024-03-04" -> 8.0)
    byUser(1L).length shouldBe 3
  }

  behavior of "Events.abTest"

  it should "dedup users, split arms by hash, and decide by the exact chi-square rule" in {
    // 60 users, several events each — conversion must count USERS, not
    // events; arm membership from the same hash both sides replay
    def armOf(u: Long): Long = {
      val h = graft.pipeline.Hashing.hash60(s"$u#ab")
      ((h % 2) + 2) % 2
    }
    val users = (1L to 60L)
    // plant a strong effect: arm-0 users convert, arm-1 users don't
    // (3 converters' worth of noise the other way)
    val rows = users.flatMap { u =>
      val converts = if (armOf(u) == 0L) u % 20 != 0 else u % 20 == 0
      val base = Seq((u * 10, u, ts(1, (u % 24).toInt), "view"),
        (u * 10 + 1, u, ts(2, (u % 24).toInt), "view"))
      if (converts)
        base ++ Seq((u * 10 + 2, u, ts(2, (u % 24).toInt), "purchase"),
          (u * 10 + 3, u, ts(3, (u % 24).toInt), "purchase")) // twice: still 1 user
      else base
    }
    val out = Events.abTest(ev(rows), "purchase").head()
    val (nA, convA, nB, convB, sig) = (out.getLong(0), out.getLong(1),
      out.getLong(2), out.getLong(3), out.getLong(4))
    nA + nB shouldBe 60L
    // replay the counts by hand
    val expA = users.filter(armOf(_) == 0L)
    val expB = users.filter(armOf(_) == 1L)
    nA shouldBe expA.size.toLong
    nB shouldBe expB.size.toLong
    convA shouldBe expA.count(_ % 20 != 0).toLong
    convB shouldBe expB.count(_ % 20 == 0).toLong
    // the planted near-total separation is overwhelmingly significant
    sig shouldBe 1L
    // and the exact rule replayed in BigInt agrees
    val (a, b, c, d) = (BigInt(convA), BigInt(nA - convA),
      BigInt(convB), BigInt(nB - convB))
    val lhs = BigInt(nA + nB) * (a * d - b * c).pow(2) * 100
    val rhs = BigInt(384) * BigInt(nA) * BigInt(nB) * (a + c) * (b + d)
    (lhs > rhs) shouldBe true
    // a no-effect fixture (everyone converts) is not significant
    val flat = users.flatMap { u =>
      Seq((u * 10, u, ts(1), "view"), (u * 10 + 1, u, ts(2), "purchase"))
    }
    Events.abTest(ev(flat), "purchase").head().getLong(4) shouldBe 0L
  }

  behavior of "Events.cusumDrift"

  it should "alarm on a sustained shift but not a single spike, per the exact recurrence" in {
    // type 'a': 6 hourly windows of counts 2,2,2,4,4,4 — total 18, nw 6,
    // k = ceil(18/6) = 3; S = 0,0,0,1,2,3; alarm at S > 9: never.
    // type 'b': counts 1,1,10,1,1,1 — total 15, k = ceil(15/6) = 3;
    // S = 0,0,7,5,3,1 — the spike decays, no alarm (3σ would fire here).
    // type 'c': counts 1,1,8,8,8,8 — total 34, k = 6;
    // S = 0,0,2,4,6,8 > 18? no... use counts 1,1,12,12,12,12: total 50,
    // k = ceil(50/6) = 9; S = 0,0,3,6,9,12; alarm when S > 27: never.
    // Sustained-shift alarm needs a long run: type 'c' with 12 windows
    // 1×6 then 12×6: total 78, k = ceil(78/12) = 7;
    // S after shift: 5,10,15,20,25,30 — alarm at S > 21 on windows 11,12.
    def burst(tpe: String, counts: Seq[Int], user0: Long) = {
      var id = user0
      counts.zipWithIndex.flatMap { case (c, h) =>
        (0 until c).map { _ =>
          id += 1
          (id, id, ts(1 + h / 24, h % 24), tpe)
        }
      }
    }
    val events = ev(
      burst("a", Seq(2, 2, 2, 4, 4, 4), 1000L) ++
        burst("b", Seq(1, 1, 10, 1, 1, 1), 2000L) ++
        burst("c", Seq(1, 1, 1, 1, 1, 1, 6, 12, 12, 12, 12, 12), 3000L))
    val got = Events.cusumDrift(events, "1 hour").collect()
      .map(r => (r.getString(1), r.getLong(0)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // replay the recurrence per type in plain Scala
    Seq("a" -> Seq(2, 2, 2, 4, 4, 4), "b" -> Seq(1, 1, 10, 1, 1, 1),
      "c" -> Seq(1, 1, 1, 1, 1, 1, 6, 12, 12, 12, 12, 12)).foreach {
      case (tpe, counts) =>
        val tot = counts.sum
        val k = (tot + counts.size - 1) / counts.size
        var sAcc = 0L
        counts.zipWithIndex.foreach { case (c, h) =>
          sAcc = math.max(0L, sAcc + (c - k))
          val w = ts(1 + h / 24, h % 24).getTime / 1000
          got((tpe, w)) shouldBe ((c.toLong, k.toLong, sAcc,
            if (sAcc > 3L * k) 1L else 0L))
        }
    }
    // the spike type never alarms; the sustained type does
    got.collect { case ((t, _), (_, _, _, al)) if al == 1L => t }
      .toSet shouldBe Set("c")
    // partition invariance (integer ops + sorted-group fold)
    Events.cusumDrift(
      ev(burst("a", Seq(2, 2, 2, 4, 4, 4), 1000L)).repartition(7), "1 hour")
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap shouldBe
      got.collect { case (("a", w), (_, _, sv, _)) => w -> sv }.toMap
  }
}
