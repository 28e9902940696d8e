package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Streaming semantics of [[StreamSample.priorityCandidates]]: the final
  * emission's global take-k equals the batch
  * [[graft.operators.CorpusOps.prioritySample]] over the full input
  * (candidates-then-finalize exactness), per-shard emissions stay bounded
  * at k, and state carries across micro-batches. */
class StreamSampleSpec extends AnyFunSuite {

  test("final emission finalizes to the batch sample; shard state bounded") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = (1L to 80L)
      .map(i => (i, s"doc $i ${"pad " * (i % 7).toInt}end", 40L + (i * 13) % 200))
    val stream = MemoryStream[(Long, String, Long)]
    val out = StreamSample.priorityCandidates(
      stream.toDF.toDF("doc_id", "text", "n_chars"), "doc_id", 5, 4)
    val q = out.toDF("shard", "doc_id", "w", "prio").writeStream
      .format("memory").queryName("samp_stream").outputMode("update").start()
    try {
      stream.addData(docs.take(30): _*)
      q.processAllAvailable()
      val n1 = spark.table("samp_stream").count()
      assert(n1 > 0)
      stream.addData(docs.drop(30): _*)
      q.processAllAvailable()
      val last = spark.table("samp_stream").collect().drop(n1.toInt)
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      // Bounded state: each shard emits at most k rows per trigger.
      for ((shard, xs) <- last.groupBy(_._1))
        assert(xs.length <= 5, s"shard $shard emitted ${xs.length} > k rows")
      // Finalize: global top-5 of the union == batch prioritySample.
      val streamed = last.toSeq
        .sortBy { case (_, id, _, p) => (-p, id) }.take(5)
        .map { case (_, id, w, _) => (id, w) }.sorted
      val batch = graft.operators.CorpusOps.prioritySample(
          docs.toDF("doc_id", "text", "n_chars"), "doc_id", 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(streamed == batch, s"stream $streamed != batch $batch")
    } finally q.stop()
  }
}
