package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Streaming semantics of [[StreamRangeJoin.intervalJoinStream]] plus its
  * batch parity with the bucket-blocked [[graft.operators.RangeJoin]]. */
class StreamRangeJoinSpec extends AnyFunSuite {

  private def ts(minOfDay: Int): java.sql.Timestamp =
    new java.sql.Timestamp(minOfDay * 60000L)

  test("stream-stream interval join emits exactly the in-range pairs across batches") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val errs  = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val views = MemoryStream[(Long, java.sql.Timestamp)]
    // Views in the 10 minutes strictly before each error (lo=-600s, hi=-60s).
    val joined = StreamRangeJoin.intervalJoinStream(
        errs.toDF.toDF("event_id", "uid", "ets"),
        views.toDF.toDF("vuid", "vts"),
        "uid", "vuid", "ets", "vts", -600L, -60L, "5 minutes")
      .select(col("event_id"), unix_micros(col("vts")).as("v_us"))
    val q = joined.writeStream.format("memory").queryName("srj")
      .outputMode("append").start()
    try {
      views.addData((1L, ts(600)), (1L, ts(604)), (2L, ts(604)))
      errs.addData((10L, 1L, ts(605)))  // window [595, 604]: hits 600 & 604 (uid 1)
      q.processAllAvailable()
      views.addData((1L, ts(605)))      // same instant + hi=-60s => not in range of 605
      errs.addData((11L, 1L, ts(620)))  // window [610, 619]: nothing
      q.processAllAvailable()
      val got = spark.table("srj").collect()
        .map(r => (r.getLong(0), r.getLong(1) / 60000000L)).toSet
      assert(got == Set((10L, 600L), (10L, 604L)), s"got $got")
    } finally q.stop()
  }

  test("batch parity: same call on batch frames equals the bucket-blocked RangeJoin") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val lRows = (1 to 40).map(i => (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(2000).toLong))
    val rRows = (1 to 60).map(_ => (rnd.nextInt(3).toLong, rnd.nextInt(2000).toLong))
    val (lo, hi) = (-300L, -1L) // seconds
    val streamStyle = StreamRangeJoin.intervalJoinStream(
        lRows.toDF("event_id", "uid", "s")
          .select(col("event_id"), col("uid"), timestamp_seconds(col("s")).as("ets")),
        rRows.toDF("vuid", "vs")
          .select(col("vuid"), timestamp_seconds(col("vs")).as("vts")),
        "uid", "vuid", "ets", "vts", lo, hi, "10 minutes")
      .select(col("event_id"), unix_micros(col("vts")).as("v_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size).toMap
    val batch = graft.operators.RangeJoin.rangeJoin(
        lRows.toDF("event_id", "uid", "us")
          .select(col("event_id"), col("uid"), (col("us") * 1000000L).as("us")),
        rRows.toDF("uid", "v_us")
          .select(col("uid"), (col("v_us") * 1000000L).as("v_us")),
        "uid", "us", "v_us", lo * 1000000L, hi * 1000000L, Seq("v_us"))
      .select(col("event_id"), col("v_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(streamStyle == batch,
      s"stream-form range join diverged from batch operator:\n$streamStyle\n$batch")
  }
}
