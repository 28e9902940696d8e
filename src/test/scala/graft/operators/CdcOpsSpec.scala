package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CdcOpsSpec extends AnyFunSuite {

  /** Keyed changelog: (key, seq, tie, value).
    *  k1: a@1, a@2, b@3, b@4, a@6  — runs a[1,3) b[3,6) a[6,∞)
    *  k2: x@5 only
    *  k3: same-seq tie at 7: ids 1 then 2 order y before z
    */
  private def log() = {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "a"), (1L, 3L, 3L, "b"),
      (1L, 4L, 4L, "b"), (1L, 6L, 5L, "a"),
      (2L, 5L, 1L, "x"),
      (3L, 7L, 1L, "y"), (3L, 7L, 2L, "z")
    ).toDF("k", "seq", "tie", "v")
  }

  test("latestSnapshot: one row per key, max (seq, tie) wins") {
    val got = CdcOps.latestSnapshot(log(), "k", "seq", "tie", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "x"), (3L, "z")))
  }

  test("scd2: runs collapse, half-open bounds chain, current run open") {
    val got = CdcOps.scd2(log(), "k", "seq", "tie", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      (1L, "a", 1L, 3L, 2L), (1L, "b", 3L, 6L, 2L), (1L, "a", 6L, -1L, 1L),
      (2L, "x", 5L, -1L, 1L),
      (3L, "y", 7L, 7L, 1L), (3L, "z", 7L, -1L, 1L)))
  }

  test("scd2 intervals tile each key: froms/tos chain without gaps") {
    val rows = CdcOps.scd2(log(), "k", "seq", "tie", "v")
      .collect().map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, iv) =>
      val sorted = iv.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, to), (_, from, _)) => assert(to == from)
        case _ => ()
      }
      assert(sorted.last._3 == Long.MaxValue) // exactly one open interval
    }
  }
}
