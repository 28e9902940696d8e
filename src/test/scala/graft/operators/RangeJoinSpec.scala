package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.TestSpark
import graft.core.PropHelpers

class RangeJoinSpec extends AnyFunSuite with PropHelpers {

  test("rangeJoin: inclusive bounds, key isolation, negative timestamps bucket correctly") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Window [ts - 10, ts - 1]: boundary hits at exactly -10 and -1,
    // misses at 0 (same instant) and -11; key 2 isolated; negative ts
    // exercises the floor-division bucketing.
    val left = Seq((1L, 1L, 0L), (2L, 1L, 100L), (3L, 2L, 0L), (4L, 1L, -20L))
      .toDF("event_id", "user_id", "us")
    val right = Seq(
      (1L, -10L), (1L, -1L), (1L, 0L), (1L, -11L), // vs left 1: hit, hit, miss, miss
      (1L, 91L), (1L, 99L),                        // vs left 2: hit, hit
      (2L, -5L),                                   // vs left 3 only
      (1L, -25L))                                  // vs left 4: hit (negative window)
      .toDF("user_id", "v_us")
    val got = RangeJoin.rangeJoin(left, right, "user_id", "us", "v_us",
        -10L, -1L, Seq("v_us"))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(got == Set((1L, -10L), (1L, -1L), (2L, 91L), (2L, 99L),
      (3L, -5L), (4L, -25L)), s"got $got")
  }

  test("property: rangeJoin equals the brute-force range predicate") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rowGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(0L, 2L), Gen.choose(-50L, 50L)))
    forAll(Gen.zip(rowGen, rowGen, Gen.choose(-20L, 5L), Gen.choose(1L, 25L)),
        n = 10) { case (ls, rs, lo, span) =>
      val hi = lo + span
      val left = ls.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
      val right = rs.map { case (k, ts) => (k, ts) }
      val expected = (for {
        (id, k, ts) <- left; (rk, rts) <- right
        if rk == k && rts >= ts + lo && rts <= ts + hi
      } yield (id, rts)).groupBy(identity).view.mapValues(_.size).toMap
      val got = RangeJoin.rangeJoin(
          left.toDF("event_id", "user_id", "us"),
          right.toDF("user_id", "v_us"),
          "user_id", "us", "v_us", lo, hi, Seq("v_us"))
        .collect().map(r => (r.getLong(0), r.getLong(3)))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(got == expected, s"lo=$lo hi=$hi\ngot $got\nexpected $expected")
    }
  }
}
