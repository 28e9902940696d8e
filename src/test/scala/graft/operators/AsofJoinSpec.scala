package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsofJoinSpec extends AnyFunSuite {

  test("asofJoin: inclusive ts, highest-ord tie-break, null when no preceding match") {
    val spark = TestSpark.spark
    import spark.implicits._
    val purchases = Seq((3L, 1L, 20L), (4L, 1L, 15L), (5L, 2L, 5L), (8L, 1L, 31L))
      .toDF("event_id", "user_id", "us")
    val views = Seq((1L, 1L, 10L), (2L, 1L, 20L), (6L, 1L, 30L), (7L, 1L, 30L))
      .map(v => (v._1, v._2, v._3, v._1, v._3))
      .toDF("event_id", "user_id", "us", "v_event_id", "v_us")
    val got = AsofJoin.asofJoin(purchases, views, "user_id", "us", "event_id",
        Seq("v_event_id", "v_us"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(4))))).toMap
    assert(got == Map(
      3L -> Some((2L, 20L)),  // equal-ts view matches (inclusive)
      4L -> Some((1L, 10L)),  // strictly-preceding view
      5L -> None,             // user with no views at all
      8L -> Some((7L, 30L))), // two views at the same ts: highest event id wins
      s"got $got")
  }

  test("asofJoin: null payload fields come through atomically, not mixed with older rows") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Latest right row has pA = null: the left row must see (null, 9),
    // never pA backfilled from the older row.
    val left = Seq((1L, 1L, 25L)).toDF("event_id", "user_id", "us")
    val right = Seq(
      (100L, 1L, 10L, Option(5L), Option(7L)),
      (101L, 1L, 20L, Option.empty[Long], Option(9L)))
      .toDF("event_id", "user_id", "us", "pa", "pb")
    val r = AsofJoin.asofJoin(left, right, "user_id", "us", "event_id",
      Seq("pa", "pb")).collect()(0)
    assert(r.isNullAt(3), s"stale pa leaked across right rows: $r")
    assert(r.getLong(4) == 9L)
  }

  test("asofJoin rejects payload collisions and missing payload columns") {
    val spark = TestSpark.spark
    import spark.implicits._
    val l = Seq((1L, 1L, 1L)).toDF("event_id", "user_id", "us")
    val r = Seq((1L, 1L, 1L, 9L)).toDF("event_id", "user_id", "us", "p")
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(l, r, "user_id", "us", "event_id", Seq("missing"))
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(l, r, "user_id", "us", "event_id", Seq("us"))
    }
  }
}
