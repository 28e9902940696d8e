package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** Degenerate-input behavior of the metrics surface: an empty prefix must
  * yield a well-formed zeroed record (not a null-poisoned json string), an
  * empty barrier list must fail loudly, and the two trigger-parse paths
  * must agree on malformed payloads. */
class SkylineOpsEdgeSpec extends AnyFunSuite {

  test("metricsJson on empty input emits a zeroed record, not null") {
    val spark = TestSpark.spark
    import spark.implicits._
    val empty = Seq.empty[(Double, Double)].toDF("x", "y")
    val got = SkylineOps.metricsJson(empty, Seq("x", "y"),
      SkylineOps.dimPartitionCol(array(col("x")), 10.0, 4), 4, "9").head()
    assert(!got.isNullAt(0))
    val json = got.getString(0)
    assert(json.contains("\"query_id\": \"9\""))
    assert(json.contains("\"record_count\": 0"))
    assert(json.contains("\"skyline_size\": 0"))
    assert(json.contains("\"optimality\": 0.0000"))
  }

  test("triggerCadence refuses an empty barrier list") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, 1.0, 2.0)).toDF("id", "x", "y")
    intercept[IllegalArgumentException] {
      SkylineOps.triggerCadence(df, "id", Seq("x", "y"),
        SkylineOps.dimPartitionCol(array(col("x")), 10.0, 4), 4, Seq.empty)
    }
  }

  test("triggerCadence: single-pass output matches per-barrier records, incl. empty prefix") {
    val spark = TestSpark.spark
    import spark.implicits._
    // ids 10..29: barrier 5 has an EMPTY prefix (must still emit a zeroed
    // record via the left-join reintroduction), 15 a partial one, 100 all.
    val df = (10L until 30L).map(i => (i, i.toDouble % 7, i.toDouble % 11))
      .toDF("id", "x", "y")
    val pid = SkylineOps.dimPartitionCol(array(col("x")), 7.0, 4)
    val got = SkylineOps.triggerCadence(df, "id", Seq("x", "y"), pid, 4,
      Seq(5L, 15L, 100L)).collect().map(_.getString(0))
    assert(got.length == 3)
    assert(got(0).contains("\"query_id\": \"1\"") &&
      got(0).contains("\"record_count\": 0") &&
      got(0).contains("\"optimality\": 0.0000"), s"empty prefix: ${got(0)}")
    // Each barrier's record must equal the naive per-prefix metricsJson.
    Seq((5L, 0), (15L, 1), (100L, 2)).foreach { case (b, i) =>
      val expect = SkylineOps.metricsJson(df.filter(col("id") <= b),
        Seq("x", "y"), pid, 4, (i + 1).toString).head().getString(0)
      assert(got(i) == expect, s"barrier $b: ${got(i)} != $expect")
    }
  }

  test("trigger barrier parse: one rule for column and state-machine paths") {
    val spark = TestSpark.spark
    import spark.implicits._
    val payloads = Seq("q1,500", "q2", "q3,abc", "q4, 42", "q5,-7")
    val colSide = graft.sources.WireFormat
      .parseTriggers(payloads.toDF("value"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    payloads.foreach { p =>
      assert(graft.streaming.StreamingSkyline.requiredCount(p) == colSide(p),
        s"column vs state-machine parse disagree on '$p'")
    }
    assert(colSide("q1,500") == 500L)
    assert(colSide("q2") == 0L,     "D5: no comma -> 0")
    assert(colSide("q3,abc") == 0L, "malformed count -> 0, not a crash")
    assert(colSide("q4, 42") == 0L, "whitespace is malformed on BOTH paths")
    assert(colSide("q5,-7") == -7L)
  }
}
