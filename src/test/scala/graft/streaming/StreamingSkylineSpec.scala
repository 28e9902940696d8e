package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.TestSpark
import graft.core.{GeoPartitioners, SkylineKernel}
import graft.streaming.StreamingSkyline.SkyEvent

/** End-to-end streaming parity (SURVEY §7.4 q5 + caveats D5/D6 + the `-1`
  * fast-path), driven through MemoryStream micro-batches. The fixed clock
  * makes every timing field deterministic. */
class StreamingSkylineSpec extends AnyFunSuite {

  private val NPart = 4
  private val clock: () => Long = () => 1000L

  private def point(id: Long, v: Array[Double]): SkyEvent =
    SkyEvent(GeoPartitioners.dimPartition(v, 10000.0, NPart), isTrigger = false,
      id, v, "", 0L)

  private def gen(n: Int): IndexedSeq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(11)
    (0 until n).map(i => (i.toLong, Array(rnd.nextInt(10000).toDouble, rnd.nextInt(10000).toDouble)))
  }

  private def parse(json: String, field: String): String = {
    val m = ("\"" + field + "\": (\"?)([^,\"}]*)").r.findFirstMatchIn(json)
    m.map(_.group(2)).getOrElse(sys.error(s"$field not in $json"))
  }

  private def runQuery(stream: MemoryStream[SkyEvent])(feed: (=> Unit) => Unit): Seq[String] = {
    val spark = TestSpark.spark
    import spark.implicits._
    val out = StreamingSkyline(stream.toDS(), NPart, clock)
    val name = s"sky_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try feed(q.processAllAvailable())
    finally q.stop()
    spark.table(name).as[String].collect().toSeq
  }

  test("snapshot at barrier N equals batch skyline of the first N records") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[SkyEvent]
    val pts = gen(500)
    val results = runQuery(stream) { sync =>
      stream.addData(pts.map { case (id, v) => point(id, v) })
      sync
      // barrier 450 is below every partition's max seen id (each of the 4
      // partitions receives some of ids 450..499 w.h.p.), so it is already
      // met when the trigger arrives in a later batch. The snapshot is the
      // skyline of ALL ingested records (cumulative state, D6) — the
      // barrier only gates execution, exactly like the reference.
      stream.addData(StreamingSkyline.fanOutTrigger("7,450", NPart, 123L))
      sync
    }
    assert(results.size == 1)
    val expected = SkylineKernel.skylineOf(ArrayBuffer(pts.map(_._2): _*)).size
    assert(parse(results.head, "skyline_size").toInt == expected)
    assert(parse(results.head, "query_id") == "7")
    assert(parse(results.head, "record_count") == "450")
    val opt = parse(results.head, "optimality").toDouble
    assert(opt >= 0.0 && opt <= 1.0)
    assert(!results.head.contains("query_latency_ms"), "D3: latency not emitted")
  }

  test("trigger parks behind the barrier and releases when data catches up") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[SkyEvent]
    val pts = gen(300)
    val (first, second) = pts.splitAt(100)
    val results = runQuery(stream) { sync =>
      stream.addData(first.map { case (id, v) => point(id, v) })
      sync
      stream.addData(StreamingSkyline.fanOutTrigger("1,250", NPart, 5L))
      sync // barrier 250 not met (max ids <= 99): no emission yet
      stream.addData(second.map { case (id, v) => point(id, v) })
      sync // data catches up: parked trigger fires
    }
    assert(results.size == 1)
    val expected = SkylineKernel.skylineOf(ArrayBuffer(pts.map(_._2): _*)).size
    assert(parse(results.head, "skyline_size").toInt == expected)
  }

  test("D5 immediate trigger + -1 fast-path: empty partitions answer at once") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[SkyEvent]
    // no data at all; payload without comma => requiredCount 0; every
    // partition is untouched (-1 fast-path) => empty global skyline
    val results = runQuery(stream) { sync =>
      stream.addData(StreamingSkyline.fanOutTrigger("9", NPart, 1L))
      sync
    }
    assert(results.size == 1)
    assert(parse(results.head, "skyline_size").toInt == 0)
    assert(parse(results.head, "record_count") == "unknown")
    assert(parse(results.head, "optimality").toDouble == 0.0)
  }

  test("fromWire: raw CSV streams through the full topology, malformed rows dropped") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pts = MemoryStream[String]
    val trg = MemoryStream[String]
    val rnd = new scala.util.Random(9)
    val raw = (0 until 200).map(i =>
      s"$i,${rnd.nextInt(10000)},${rnd.nextInt(10000)}")
    val name = s"sky_wire_${System.nanoTime()}"
    val n = NPart // local copy: the closure must not capture the spec class
    val out = StreamingSkyline.fromWire(
      pts.toDS().toDF("value"), trg.toDS().toDF("value"),
      v => graft.core.GeoPartitioners.dimPartition(v, 10000.0, n), n, clock)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      pts.addData(raw ++ Seq("bogus-line", "7", "3,4,x")) // malformed: dropped
      q.processAllAvailable()
      trg.addData("1,150") // barrier below every partition's max id w.h.p.
      q.processAllAvailable()
    } finally q.stop()
    val results = spark.table(name).as[String].collect().toSeq
    assert(results.size == 1)
    val vecs = raw.map(_.split(",").drop(1).map(_.toDouble))
    val expected = SkylineKernel.skylineOf(ArrayBuffer(vecs: _*)).size
    assert(parse(results.head, "skyline_size").toInt == expected)
  }

  test("global latch accumulates across micro-batches (split release)") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[SkyEvent]
    val rnd = new scala.util.Random(5)
    def pts(pids: Seq[Int], ids: Range) = ids.flatMap(i => pids.map(p =>
      SkyEvent(p, isTrigger = false, i.toLong,
        Array(rnd.nextInt(10000).toDouble, rnd.nextInt(10000).toDouble), "", 0L)))
    val early = pts(Seq(0, 1), 0 until 100)  // pids 0,1 past the barrier
    val late1 = pts(Seq(2, 3), 0 until 20)   // pids 2,3 behind it
    val late2 = pts(Seq(2, 3), 20 until 100) // ...until this batch arrives
    val name = s"sky_stream_${System.nanoTime()}"
    val q = StreamingSkyline(stream.toDS(), NPart, clock)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      stream.addData(early ++ late1)
      q.processAllAvailable()
      stream.addData(StreamingSkyline.fanOutTrigger("4,50", NPart, 1L))
      q.processAllAvailable()
      // pids 0,1 answered; 2,3 parked — latch (2 of 4) must NOT emit yet
      assert(spark.table(name).count() == 0)
      stream.addData(late2)
      q.processAllAvailable()
    } finally q.stop()
    val results = spark.table(name).as[String].collect().toSeq
    assert(results.size == 1)
    val all = (early ++ late1 ++ late2).map(_.values)
    val expected = SkylineKernel.skylineOf(ArrayBuffer(all: _*)).size
    assert(parse(results.head, "skyline_size").toInt == expected)
  }

  test("D7: -1 fast-path answers for untouched partitions ahead of late data") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[SkyEvent]
    val rnd = new scala.util.Random(13)
    // Data lands ONLY in pids 0 and 1; 2 and 3 never see a record. A
    // barrier trigger met by 0/1 must emit after ONE batch — the untouched
    // partitions answer via the -1 fast-path (FlinkSkyline.java:342-355)
    // instead of parking the latch until data eventually shows up there.
    val pts = (0 until 120).map(i => SkyEvent(i % 2, isTrigger = false, i.toLong,
      Array(rnd.nextInt(10000).toDouble, rnd.nextInt(10000).toDouble), "", 0L))
    val results = runQuery(stream) { sync =>
      stream.addData(pts)
      sync
      stream.addData(StreamingSkyline.fanOutTrigger("6,100", NPart, 2L))
      sync // all four partitions answer in this batch: 0/1 barrier-met, 2/3 fast-path
    }
    assert(results.size == 1)
    val expected = SkylineKernel.skylineOf(ArrayBuffer(pts.map(_.values): _*)).size
    assert(parse(results.head, "skyline_size").toInt == expected)
    assert(parse(results.head, "query_id") == "6")
    // Optimality still divides by the FIXED partition count (D4): only the
    // two reporting partitions contribute ratios <= 1 each.
    assert(parse(results.head, "optimality").toDouble <= 0.5)
  }

  test("checkpoint recovery: state (skylines + barriers) survives a restart") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[SkyEvent]
    val pts = gen(300)
    val ckpt = java.nio.file.Files.createTempDirectory("sky_ckpt_").toString
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[String]
    def start() = StreamingSkyline(stream.toDS(), NPart, clock)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[String], _: Long) =>
        batch.collect().foreach(sink.add)
      }
      .start()
    // Phase 1: ingest everything, commit the batch, then KILL the query
    // before any trigger arrives — the cumulative local skylines and id
    // high-water marks exist only in the state store now.
    val q1 = start()
    try { stream.addData(pts.map { case (id, v) => point(id, v) }); q1.processAllAvailable() }
    finally q1.stop()
    assert(sink.isEmpty)
    // Phase 2: restart from the checkpoint and query. The barrier (250) is
    // only satisfiable from RESTORED state — the restarted query never
    // re-reads the phase-1 batch (its offsets are committed).
    val q2 = start()
    try { stream.addData(StreamingSkyline.fanOutTrigger("11,250", NPart, 3L)); q2.processAllAvailable() }
    finally q2.stop()
    val results = sink.toArray(Array.empty[String]).toSeq
    assert(results.size == 1)
    val expected = SkylineKernel.skylineOf(ArrayBuffer(pts.map(_._2): _*)).size
    assert(parse(results.head, "skyline_size").toInt == expected)
    assert(parse(results.head, "query_id") == "11")
    assert(parse(results.head, "record_count") == "250")
  }

  test("D6: local skylines are cumulative — second query sees all data") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[SkyEvent]
    val pts = gen(400)
    val (first, second) = pts.splitAt(200)
    val results = runQuery(stream) { sync =>
      stream.addData(first.map { case (id, v) => point(id, v) })
      stream.addData(StreamingSkyline.fanOutTrigger("1,150", NPart, 1L))
      sync
      stream.addData(second.map { case (id, v) => point(id, v) })
      stream.addData(StreamingSkyline.fanOutTrigger("2,350", NPart, 2L))
      sync
    }
    assert(results.size == 2)
    val byQid = results.map(r => parse(r, "query_id") -> r).toMap
    val exp1 = SkylineKernel.skylineOf(ArrayBuffer(first.map(_._2): _*)).size
    val expAll = SkylineKernel.skylineOf(ArrayBuffer(pts.map(_._2): _*)).size
    assert(parse(byQid("1"), "skyline_size").toInt == exp1)
    assert(parse(byQid("2"), "skyline_size").toInt == expAll)
  }
}
