package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.TestSpark

/** Batch parity of [[StreamEwma.ewmaUpdates]]: the emission series equals
  * `ewmaDaily(dailyFill(…))` — same rows, same scaled numerators — when
  * per-group days arrive ascending (split across triggers arbitrarily),
  * including groups whose active days skip (the stream zero-fills). */
class StreamEwmaSpec extends AnyFunSuite {

  private val w = 5

  /** (grp, day, n) active-day counts; gaps inside each group's span. */
  private def series(): Seq[(String, Long, Long)] = {
    val rnd = new scala.util.Random(19)
    for {
      g <- Seq("a", "b", "c")
      day <- 10L to 30L
      if rnd.nextInt(3) != 0 // skip ~1/3 of days → real gaps
    } yield (g, day, 1L + rnd.nextInt(9))
  }

  private def batchRef(rows: Seq[(String, Long, Long)])
      : Map[(String, Long), (Long, Long)] = {
    val spark = TestSpark.spark
    import spark.implicits._
    val daily = graft.operators.EventOps.dailyFill(
      rows.flatMap { case (g, day, n) =>
        (1L to n).map(_ => (g, day * 86400000000L)) }.toDF("g", "us"),
      Seq("g"), "us")
    graft.operators.EventOps.ewmaDaily(daily, Seq("g"), "day", "n_events", w)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("emission series equals the batch ewmaDaily over the filled series") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = series()
    val ref = batchRef(rows)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(String, Long, Long)]
    val out = StreamEwma.ewmaUpdates(
      stream.toDF.toDF("g", "day", "n"), "g", "day", "n", w)
    val q = out.toDF("g", "day", "n", "ewma_num").writeStream
      .format("memory").queryName("ewma_stream").outputMode("update").start()
    try {
      // Day-ascending per group, split across three triggers mid-span.
      val ordered = rows.sortBy { case (g, day, _) => (day, g) }
      ordered.grouped(math.max(1, ordered.length / 3)).foreach { chunk =>
        stream.addData(chunk: _*)
        q.processAllAvailable()
      }
      val got = spark.table("ewma_stream").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      assert(got == ref,
        "streamed numerators must equal the batch filled-series EWMA")
    } finally q.stop()
  }

  test("spikeUpdates emission flags equal the batch spikeDays over the filled series") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Flat-ish series with one planted burst per group so real spikes exist.
    val rows = series().map { case (g, day, n) =>
      if (day == 25L) (g, day, n + 40L) else (g, day, n) }
    val daily = graft.operators.EventOps.dailyFill(
      rows.flatMap { case (g, day, n) =>
        (1L to n).map(_ => (g, day * 86400000000L)) }.toDF("g", "us"),
      Seq("g"), "us")
    val ref = graft.operators.EventOps.spikeDays(daily, Seq("g"), "day",
        "n_events", w)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(6)).toMap
    assert(ref.values.sum > 0, "fixture must contain at least one spike")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(String, Long, Long)]
    val out = StreamEwma.spikeUpdates(
      stream.toDF.toDF("g", "day", "n"), "g", "day", "n", w)
    val q = out.toDF("g", "day", "n", "is_spike").writeStream
      .format("memory").queryName("spike_stream").outputMode("update").start()
    try {
      val ordered = rows.sortBy { case (g, day, _) => (day, g) }
      ordered.grouped(math.max(1, ordered.length / 4)).foreach { chunk =>
        stream.addData(chunk: _*)
        q.processAllAvailable()
      }
      val got = spark.table("spike_stream").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
      assert(got == ref)
    } finally q.stop()
  }

  test("stale (non-ascending) days are dropped, not merged") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(String, Long, Long)]
    val out = StreamEwma.ewmaUpdates(
      stream.toDF.toDF("g", "day", "n"), "g", "day", "n", 3)
    val q = out.toDF("g", "day", "n", "ewma_num").writeStream
      .format("memory").queryName("ewma_stream2").outputMode("update").start()
    try {
      stream.addData(("g", 5L, 2L))
      q.processAllAvailable()
      stream.addData(("g", 4L, 9L)) // late day — must not rewrite history
      q.processAllAvailable()
      val got = spark.table("ewma_stream2").collect()
        .map(r => (r.getLong(1), r.getLong(3)))
      assert(got.toSet == Set((5L, 2L * 64L)))
    } finally q.stop()
  }
}
