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
