package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.TestSpark

/** Batch parity of [[StreamCdc.latestUpdates]]: the last emission per key
  * equals [[graft.operators.CdcOps.latestSnapshot]] under ANY arrival
  * order — the changelog is shuffled ACROSS triggers (not just within),
  * which the max-fold contract must absorb. */
class StreamCdcSpec extends AnyFunSuite {

  private def log(): Seq[(Long, Long, Long, String)] = {
    val rnd = new scala.util.Random(11)
    (1L to 30L).flatMap { k =>
      (1 to 8).map { j =>
        (k, rnd.nextInt(100).toLong, j.toLong, s"v${rnd.nextInt(9)}")
      }
    }
  }

  test("final per-key emission equals the batch snapshot; ties break on tie column") {
    val spark = TestSpark.spark
    import spark.implicits._
    val evs = log()
    val batch = graft.operators.CdcOps.latestSnapshot(
        evs.toDF("k", "seq", "tie", "v"), "k", "seq", "tie", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // Arbitrary split: arrival order across triggers deliberately NOT
    // time-ordered.
    val shuffled = new scala.util.Random(3).shuffle(evs)
    val (h1, h2) = shuffled.splitAt(shuffled.length / 2)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Long, String)]
    val out = StreamCdc.latestUpdates(
      stream.toDF.toDF("k", "seq", "tie", "v"), "k", "seq", "tie", "v")
    val q = out.toDF("k", "seq", "tie", "v").writeStream
      .format("memory").queryName("cdc_stream").outputMode("update").start()
    try {
      stream.addData(h1: _*)
      q.processAllAvailable()
      stream.addData(h2: _*)
      q.processAllAvailable()
      // Last emission per key = the row with the max (seq, tie) among that
      // key's emissions (each emission carries its winning seq/tie).
      val last = spark.table("cdc_stream").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
        .groupBy(_._1)
        .map { case (k, xs) => k -> xs.map(_._2).maxBy(t => (t._1, t._2))._3 }
      assert(last == batch)
    } finally q.stop()
  }

  test("state carries across triggers: an older change cannot regress the snapshot") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Long, String)]
    val out = StreamCdc.latestUpdates(
      stream.toDF.toDF("k", "seq", "tie", "v"), "k", "seq", "tie", "v")
    val q = out.toDF("k", "seq", "tie", "v").writeStream
      .format("memory").queryName("cdc_stream2").outputMode("update").start()
    try {
      stream.addData((1L, 10L, 1L, "new"))
      q.processAllAvailable()
      stream.addData((1L, 5L, 9L, "stale")) // late, lower seq — must lose
      q.processAllAvailable()
      val rows = spark.table("cdc_stream2").collect()
        .map(r => (r.getLong(1), r.getString(3)))
      assert(rows.toSet == Set((10L, "new"))) // both triggers emit the winner
    } finally q.stop()
  }
}
