package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class EventOpsSpec extends AnyFunSuite {

  /** Hand-built event log (user, us, type). Funnel view→click→purchase:
    *  u1: view@10, click@20, purchase@30  — full conversion
    *  u2: view@10, click@10 (tie — no),  purchase@50 (no stage-2)
    *  u3: click@5, view@10, click@15, purchase@12 (purchase BEFORE the
    *      stage-2 click ⇒ no stage 3; click@5 before the view ignored)
    *  u4: view only
    *  u5: click, purchase but never a view — enters no stage
    */
  private def ev() = {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 10L, "view"), (2L, 10L, "click"), (2L, 50L, "purchase"),
      (3L, 5L, "click"), (3L, 10L, "view"), (3L, 15L, "click"), (3L, 12L, "purchase"),
      (4L, 10L, "view"),
      (5L, 5L, "click"), (5L, 9L, "purchase")
    ).toDF("user_id", "us", "event_type")
  }

  test("funnel: strictly-after conversion, stage counts") {
    val rows = EventOps.funnel(ev(), "user_id", "us", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // stage1 = {u1,u2,u3,u4}; stage2 = {u1 (20>10), u3 (15>10)} — u2's
    // click ties its view; stage3 = {u1} — u3's purchase precedes its
    // qualifying click.
    assert(rows == Set((1L, "view", 4L), (2L, "click", 2L), (3L, "purchase", 1L)))
    graft.core.Caches.releaseAll()
  }

  test("funnel: single-step degenerates to distinct users with that event") {
    val rows = EventOps.funnel(ev(), "user_id", "us", "event_type", Seq("click"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, "click", 4L)))
    graft.core.Caches.releaseAll()
  }

  test("funnelReachTimes: completing users only, chained-min times") {
    val rows = EventOps.funnelReachTimes(ev(), "user_id", "us", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // Only u1 completes; reach times are the chained minima.
    assert(rows.toSeq == Seq((1L, 10L, 20L, 30L)))
    graft.core.Caches.releaseAll()
  }

  test("retention: cohort triangle matches brute force") {
    val spark = TestSpark.spark
    import spark.implicits._
    val day = 86400000000L
    // u1 first day 0, active 0,1,3 (dup same-day events collapse);
    // u2 first day 1, active 1,2; u3 first day 3 only.
    val df = Seq(
      (1L, 0L), (1L, 100L), (1L, day + 5L), (1L, 3 * day + 1L),
      (2L, day + 7L), (2L, 2 * day),
      (3L, 3 * day)
    ).toDF("user_id", "us")
    val got = EventOps.retention(df, "user_id", "us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L),
      (3L, 0L, 1L)))
    graft.core.Caches.releaseAll()
  }

  test("gapStats: per-key day gaps aggregated through the dim join") {
    val spark = TestSpark.spark
    import spark.implicits._
    // key 1 (grp A): days 10, 12, 12, 20 → gaps {2, 0, 8}
    // key 2 (grp A): day 5 only → no gaps
    // key 3 (grp B): days 1, 4 → gaps {3}
    val fact = Seq(
      (1L, 10L, 100L), (1L, 12L, 101L), (1L, 12L, 102L), (1L, 20L, 103L),
      (2L, 5L, 104L),
      (3L, 1L, 105L), (3L, 4L, 106L)
    ).toDF("k_in", "d", "ord")
    val dim = Seq((1L, "A"), (2L, "A"), (3L, "B")).toDF("dk", "seg")
    val got = EventOps.gapStats(fact, "k_in", col("d"), "ord", dim, "dk", "seg")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(("A", 3L, 10L, 8L), ("B", 1L, 3L, 3L)))
  }

  test("dailyFill: in-span missing days appear as zeros, spans are per-group") {
    val spark = TestSpark.spark
    import spark.implicits._
    val us = 86400000000L
    // Group (a,1): events on days 5, 5, 8 → span 5..8 with zeros at 6, 7.
    // Group (b,1): day 3 only → one row, no fill.
    val events = Seq(
      ("a", 1L, 5L * us), ("a", 1L, 5L * us + 7L), ("a", 1L, 8L * us),
      ("b", 1L, 3L * us)
    ).toDF("event_type", "user_id", "us")
    val got = EventOps.dailyFill(events, Seq("event_type", "user_id"), "us")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      ("a", 1L, 5L, 2L), ("a", 1L, 6L, 0L), ("a", 1L, 7L, 0L),
      ("a", 1L, 8L, 1L), ("b", 1L, 3L, 1L)))
  }

  test("rollingDailySum: a 3-day frame over the filled series sums calendar days") {
    val spark = TestSpark.spark
    import spark.implicits._
    val daily = Seq(
      ("a", 5L, 2L), ("a", 6L, 0L), ("a", 7L, 0L), ("a", 8L, 1L),
      ("b", 3L, 4L)
    ).toDF("g", "day", "n")
    val got = EventOps.rollingDailySum(daily, Seq("g"), "day", "n", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    // a: 2, 2, 2, 1 (frames {5},{5,6},{5,6,7},{6,7,8}); b: 4.
    assert(got == Set(
      ("a", 5L, 2L), ("a", 6L, 2L), ("a", 7L, 2L), ("a", 8L, 1L),
      ("b", 3L, 4L)))
  }

  test("ewmaDaily: scaled numerator matches the hand-computed truncated recursion") {
    val spark = TestSpark.spark
    import spark.implicits._
    // w = 3: weights (j=0,1,2) are 64, 56, 49 (7^j * 8^(2-j)).
    val daily = Seq(
      ("a", 1L, 10L), ("a", 2L, 0L), ("a", 3L, 4L), ("a", 4L, 2L)
    ).toDF("g", "day", "n")
    val got = EventOps.ewmaDaily(daily, Seq("g"), "day", "n", 3)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got == Map(
      1L -> (10 * 64L),                      // only one term exists
      2L -> (0 * 64L + 10 * 56L),
      3L -> (4 * 64L + 0 * 56L + 10 * 49L),
      4L -> (2 * 64L + 4 * 56L + 0 * 49L))) // day-1 term aged out
  }

  test("spikeDays: full-history 3-sigma test flags the spike, not the ramp") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Flat baseline of 5 for a week, then a day at 50: σ = 0 on the flat
    // window, so any bump flags; the first 7 days have no full history
    // and must stay 0 regardless of value.
    val daily = ((1L to 7L).map(d => ("a", d, 5L)) :+ ("a", 8L, 50L) :+ ("a", 9L, 5L))
      .toDF("g", "day", "n")
    val got = EventOps.spikeDays(daily, Seq("g"), "day", "n", 7)
      .collect().map(r => r.getLong(1) -> r.getLong(6)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 0L,
      6L -> 0L, 7L -> 0L, 8L -> 1L, 9L -> 0L))
    // With a noisy baseline the same absolute bump must NOT flag: the
    // variance term scales the fence.
    val noisy = (Seq(("b", 1L, 1L), ("b", 2L, 9L), ("b", 3L, 2L), ("b", 4L, 8L),
      ("b", 5L, 1L), ("b", 6L, 9L), ("b", 7L, 5L)) :+ ("b", 8L, 10L))
      .toDF("g", "day", "n")
    val gotNoisy = EventOps.spikeDays(noisy, Seq("g"), "day", "n", 7)
      .collect().map(r => r.getLong(1) -> r.getLong(6)).toMap
    assert(gotNoisy(8L) == 0L,
      s"a within-3-sigma bump over a noisy baseline must not flag: $gotNoisy")
  }
}
