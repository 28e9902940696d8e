package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.TestSpark

/** Streaming semantics of [[StreamHeavyHitters.topCandidates]]: the heavy
  * value survives every emission across micro-batches, per-shard emissions
  * stay bounded by the sketch capacity, and counts accumulate across
  * batches (state carries over). */
class StreamHeavyHittersSpec extends AnyFunSuite {

  test("heavy value survives batches; per-shard state stays within capacity") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[String]
    val out = StreamHeavyHitters.topCandidates(
      stream.toDF.toDF("tok"), "tok", 2, 4)
    val q = out.toDF("shard", "tok", "cnt").writeStream
      .format("memory").queryName("hh_stream").outputMode("update").start()
    try {
      val r = new scala.util.Random(13)
      def noise(n: Int) = (1 to n).map(_ => s"n${r.nextInt(30)}")
      stream.addData(Seq.fill(20)("hot") ++ noise(15): _*)
      q.processAllAvailable()
      val n1 = spark.table("hh_stream").count()
      stream.addData(Seq.fill(25)("hot") ++ noise(15): _*)
      q.processAllAvailable()
      val rows = spark.table("hh_stream").collect()
        .map(x => (x.getInt(0), x.getString(1), x.getLong(2)))
      // Batch-2 emission: one row per surviving counter, ≤ cap per shard.
      val batch2 = rows.drop(n1.toInt)
      assert(batch2.nonEmpty)
      for ((shard, xs) <- batch2.groupBy(_._1))
        assert(xs.length <= 4, s"shard $shard emitted ${xs.length} > cap rows")
      // The heavy value survives in both emissions, count accumulated
      // across batches (45 occurrences, decrements can only take a few).
      val hotCounts = rows.filter(_._2 == "hot").map(_._3)
      assert(hotCounts.length >= 2, s"hot missing from an emission: ${rows.toSeq}")
      assert(hotCounts.max > 20, s"state did not carry across batches: ${hotCounts.toSeq}")
    } finally q.stop()
  }
}
