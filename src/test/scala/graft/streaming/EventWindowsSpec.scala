package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.TestSpark

/** Streaming semantics of [[EventWindows.windowedKeyCounts]]: incremental
  * window updates across micro-batches, and the watermark discarding a row
  * that arrives after its window has passed the lateness bound. */
class EventWindowsSpec extends AnyFunSuite {

  private def ts(minOfDay: Int): java.sql.Timestamp =
    new java.sql.Timestamp(minOfDay * 60000L) // minutes past epoch (UTC)

  test("windowed counts update across batches; later-than-watermark rows drop") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val counts = EventWindows.windowedKeyCounts(
      stream.toDF.toDF("ts", "et"), "ts", "et", "10 minutes", "5 minutes")
    val q = counts.writeStream.format("memory").queryName("evt_win")
      .outputMode("update").start()
    try {
      stream.addData((ts(600), "a"), (ts(601), "a")) // window [600, 610)
      q.processAllAvailable()
      stream.addData((ts(630), "a"))                 // advances watermark to 625
      q.processAllAvailable()
      // 602 is now older than the watermark -> discarded; 631 still updates.
      stream.addData((ts(602), "a"), (ts(631), "a"))
      q.processAllAvailable()
      val updates = spark.table("evt_win").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000L, r.getString(1), r.getLong(2)))
      val w600max = updates.collect { case (600L, "a", c) => c }.max
      val w630max = updates.collect { case (630L, "a", c) => c }.max
      assert(w600max == 2L, s"late row must not reach the closed window: $updates")
      assert(w630max == 2L, s"in-time row must keep updating its window: $updates")
    } finally q.stop()
  }

  test("session windows merge within gap and finalize once the watermark passes") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val sessions = EventWindows.sessionCounts(
      stream.toDF.toDF("ts", "uid"), "ts", "uid", "10 minutes", "5 minutes")
    // Append mode: a session row is emitted exactly once, when the
    // watermark passes its close — the bounded-state contract itself.
    val q = sessions.writeStream.format("memory").queryName("evt_sess")
      .outputMode("append").start()
    try {
      stream.addData((ts(600), "u"), (ts(605), "u"), (ts(609), "u"))
      q.processAllAvailable()          // one open session [600, 619)
      stream.addData((ts(640), "u"))   // watermark -> 635, past 619
      q.processAllAvailable()
      stream.addData((ts(660), "u"))   // extra batch flushes finalization
      q.processAllAvailable()
      val rows = spark.table("evt_sess").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime / 60000L, r.getLong(2)))
      assert(rows.contains(("u", 600L, 3L)),
        s"first session (3 events merged across batches) not finalized: ${rows.toSeq}")
      assert(!rows.exists(_._2 == 660L), "still-open session must not emit in append mode")
    } finally q.stop()
  }

  test("windowed frontier: cross-batch skyline state, final frontier on window close, batch parity") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Double, Double)]
    val frontier = EventWindows.windowedFrontier(
      stream.toDF.toDF("ts", "x", "y"), "ts", Seq("x", "y"),
      "10 minutes", "5 minutes")
    val q = frontier.writeStream.format("memory").queryName("evt_sky")
      .outputMode("append").start()
    try {
      // Window [600, 610): batch 1 has a provisional frontier {(1,5),(3,3)};
      // batch 2's (2,2) then dominates (3,3) IN STATE — the final frontier
      // must be {(1,5),(2,2),(5,1)}.
      stream.addData((ts(600), 1.0, 5.0), (ts(601), 3.0, 3.0))
      q.processAllAvailable()
      stream.addData((ts(602), 2.0, 2.0), (ts(603), 5.0, 1.0))
      q.processAllAvailable()
      stream.addData((ts(630), 9.0, 9.0)) // watermark -> 625, closes [600,610)
      q.processAllAvailable()
      stream.addData((ts(660), 8.0, 8.0)) // extra batch flushes finalization
      q.processAllAvailable()
      val rows = spark.table("evt_sky").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000L, r.getDouble(1), r.getDouble(2)))
      assert(rows.filter(_._1 == 600L).map(t => (t._2, t._3)).toSet ==
        Set((1.0, 5.0), (2.0, 2.0), (5.0, 1.0)), s"got ${rows.toSeq}")
      assert(!rows.exists(_._1 == 660L), "still-open window must not emit in append mode")
      // Batch parity: the same function over a plain DataFrame.
      val batch = EventWindows.windowedFrontier(
        Seq((ts(600), 1.0, 5.0), (ts(601), 3.0, 3.0), (ts(602), 2.0, 2.0),
          (ts(603), 5.0, 1.0)).toDF("ts", "x", "y"),
        "ts", Seq("x", "y"), "10 minutes", "5 minutes")
        .collect().map(r => (r.getTimestamp(0).getTime / 60000L, r.getDouble(1), r.getDouble(2)))
      assert(batch.toSet == Set((600L, 1.0, 5.0), (600L, 2.0, 2.0), (600L, 5.0, 1.0)))
    } finally q.stop()
  }
}
