package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.TestSpark

/** Streaming semantics of [[StreamDedup.dedupExactStream]]: duplicates
  * within the watermark horizon drop (including normalization-equal text),
  * distinct text passes, and a duplicate AFTER the horizon is treated as
  * new (the documented bounded-state trade). */
class StreamDedupSpec extends AnyFunSuite {

  private def ts(minOfDay: Int): java.sql.Timestamp =
    new java.sql.Timestamp(minOfDay * 60000L)

  test("in-horizon duplicates drop, normalization applies, horizon eviction re-admits") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val out = StreamDedup.dedupExactStream(
      stream.toDF.toDF("ts", "text"), "ts", "5 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      // "A  b" normalizes to the same hash as "a b" -> duplicate.
      stream.addData((ts(600), "a b"), (ts(601), "A  b"), (ts(601), "c d"))
      q.processAllAvailable()
      // Advance far past the horizon, then repeat "a b": state evicted,
      // passes as new.
      stream.addData((ts(700), "advance"))
      q.processAllAvailable()
      stream.addData((ts(701), "a b"))
      q.processAllAvailable()
      stream.addData((ts(800), "flush"))
      q.processAllAvailable()
      val texts = spark.table("dedup_stream").collect().map(_.getString(1)).toSeq
      assert(texts.count(t => t.replaceAll(" +", " ").toLowerCase == "a b") == 2,
        s"'a b' should pass once per horizon: $texts")
      assert(!texts.contains("A  b"), s"normalized duplicate must drop: $texts")
      assert(texts.contains("c d"))
    } finally q.stop()
  }
}
