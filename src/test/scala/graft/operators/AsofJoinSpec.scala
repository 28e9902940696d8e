package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.TestSpark
import graft.core.PropHelpers

class AsofJoinSpec extends AnyFunSuite with PropHelpers {

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

  test("property: asofJoin equals the brute-force latest-preceding rule") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Dense timestamp range forces plenty of exact-tie cases.
    val evGen = Gen.listOfN(25, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 15L)))
    forAll(Gen.zip(evGen, evGen), n = 10) { case (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
      val right = rs.zipWithIndex.map { case ((k, ts), i) => (1000L + i, k, ts) }
      // Brute force: the right row with max (ts, event_id) among same-key
      // rows with ts <= left.ts.
      val expected = left.map { case (id, k, ts) =>
        val cand = right.filter(r => r._2 == k && r._3 <= ts)
        id -> (if (cand.isEmpty) None
               else Some(cand.maxBy(r => (r._3, r._1))._1))
      }.toMap
      val got = AsofJoin.asofJoin(
          left.toDF("event_id", "user_id", "us"),
          right.toDF("event_id", "user_id", "us")
            .select(org.apache.spark.sql.functions.col("event_id"),
              org.apache.spark.sql.functions.col("user_id"),
              org.apache.spark.sql.functions.col("us"),
              org.apache.spark.sql.functions.col("event_id").as("v_id")),
          "user_id", "us", "event_id", Seq("v_id"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toMap
      assert(got == expected, s"left=$left\nright=$right\ngot $got\nexpected $expected")
    }
  }

  test("property: asofJoinForward equals the brute-force earliest-following rule") {
    val spark = TestSpark.spark
    import spark.implicits._
    val evGen = Gen.listOfN(25, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 15L)))
    forAll(Gen.zip(evGen, evGen), n = 10) { case (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
      val right = rs.zipWithIndex.map { case ((k, ts), i) => (1000L + i, k, ts) }
      // Brute force: the right row with min (ts, event_id) among same-key
      // rows with ts >= left.ts.
      val expected = left.map { case (id, k, ts) =>
        val cand = right.filter(r => r._2 == k && r._3 >= ts)
        id -> (if (cand.isEmpty) None
               else Some(cand.minBy(r => (r._3, r._1))._1))
      }.toMap
      val got = AsofJoin.asofJoinForward(
          left.toDF("event_id", "user_id", "us"),
          right.toDF("event_id", "user_id", "us")
            .select(org.apache.spark.sql.functions.col("event_id"),
              org.apache.spark.sql.functions.col("user_id"),
              org.apache.spark.sql.functions.col("us"),
              org.apache.spark.sql.functions.col("event_id").as("v_id")),
          "user_id", "us", "event_id", Seq("v_id"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toMap
      assert(got == expected, s"left=$left\nright=$right\ngot $got\nexpected $expected")
    }
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
