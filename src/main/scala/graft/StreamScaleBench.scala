package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{array, col}

import graft.core.{DataGen, GeoPartitioners}
import graft.operators.SkylineOps
import graft.sources.DataGenSource
import graft.streaming.StreamingSkyline
import graft.streaming.StreamingSkyline.SkyEvent

/** Streaming-mode scalability envelope: the reference's headline claim
  * ("linear up to 10M records 2D/3D, total time < 400 s" —
  * `project_documentation.pdf` p.17 §5.2, BASELINE.md) reproduced through
  * the ACTUAL streaming topology ([[StreamingSkyline]]: MR-Dim keyed local
  * phase → latched global merge), not the batch analog — with a query
  * trigger fanned out every `cadence` records and every snapshot checked
  * for parity against the batch skyline of its exact prefix (SURVEY §7.4
  * item 5).
  *
  * Feed: a MemoryStream of sub-block indices, flatMapped executor-side to
  * the deterministic [[DataGen]] anti-correlated stream (the driver never
  * holds points; the same generator drives the batch envelope, ScaleBench).
  * Each cadence cycle ingests its block across 32 generation tasks, then a
  * D5-immediate trigger ("q<i>,0" — barrier trivially met, so the snapshot
  * is the skyline of EXACTLY the records ingested so far) is fanned out and
  * processed in its own micro-batch. Per cycle the JSON records ingest and
  * query wall seconds, the streamed skyline_size, and the batch oracle —
  * the DISTRIBUTED batch MR skyline ([[SkylineOps.mrSkylinePoints]], 32-way
  * partial aggregation + merge) of the same generated prefix. The two
  * paths share only the dominance/SFS kernel: topology (8-partition keyed
  * state machine vs map-side combine tree), orderings, and merge schedule
  * are independent, so multiset-size agreement at every boundary pins the
  * frontier from two directions. (A driver-side single-threaded fold was
  * the first oracle shape — correct but serial: the 3D×10M frontier is
  * ~135k points and one thread pays the whole compaction cost the batch
  * engine spreads over 32 tasks.)
  *
  * Run: `sbt -batch "runMain graft.StreamScaleBench"`; env knobs
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_STREAM_N (default 10M),
  * SPARK_GRAFT_STREAM_CADENCE (default 1M), SPARK_GRAFT_STREAM_DIMS
  * (default "2,3"), SPARK_GRAFT_STREAM_OUT.
  */
object StreamScaleBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_STREAM_N", "10000000").toLong
    val cadence = sys.env.getOrElse("SPARK_GRAFT_STREAM_CADENCE", "1000000").toLong
    val dimsList = sys.env.getOrElse("SPARK_GRAFT_STREAM_DIMS", "2,3")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val nPart = 8
    val dMax = 10000
    val seed = 42L
    val subBlocks = 32           // generation tasks per cadence cycle
    val subSize = cadence / subBlocks
    require(cadence % subBlocks == 0 && n % cadence == 0,
      s"n/cadence/subBlocks must nest: n=$n cadence=$cadence")

    // The out file is rewritten after EVERY completed cell so a long run
    // killed mid-3D still leaves the finished cells on disk.
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_STREAM_OUT", "SCALE_STREAM_out.json"))
    val done = scala.collection.mutable.ListBuffer.empty[String]
    def emit(): String = {
      val line = s"""{"metric":"stream_scale_envelope","npart":$nPart,"distribution":"anti_correlated","cells":${done.mkString("[", ",", "]")}}"""
      java.nio.file.Files.writeString(outPath, line)
      line
    }

    dimsList.foreach { dims =>
      // Batch oracle: the distributed MR skyline of each exact prefix over
      // the same generated stream, cached once (see scaladoc).
      val names = Seq("x", "y", "z", "w").take(dims)
      val gen = DataGenSource.pointsDF(spark, "anti_correlated", seed, n,
          dims, 0, dMax, numPartitions = cpus.toInt * 4)
        .select(col("id") +: names.zipWithIndex.map {
          case (c, i) => col("values")(i).as(c) }: _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pidCol = SkylineOps.dimPartitionCol(
        array(names.map(col): _*), dMax.toDouble, nPart)
      val oracle = (1L to n / cadence).map { cyc =>
        SkylineOps.mrSkylinePoints(
          gen.filter(col("id") < cyc * cadence), names, pidCol).count()
      }
      gen.unpersist(blocking = false)

      val points = MemoryStream[Long]
      val triggers = MemoryStream[SkyEvent]
      // Executor-side generation: one sub-block row fans out to subSize
      // deterministic points; repartition spreads the 32 rows over 32
      // tasks BEFORE the flatMap so generation parallelizes.
      val pointEvents = points.toDS().repartition(subBlocks).flatMap { blk =>
        val lo = blk * subSize
        (lo until lo + subSize).iterator.map { i =>
          val v = DataGen.antiCorrelated(seed, i, dims, 0, dMax)
          SkyEvent(GeoPartitioners.dimPartition(v, dMax.toDouble, nPart),
            isTrigger = false, i, v, "", 0L)
        }
      }
      val name = s"stream_scale_${dims}d"
      val q = StreamingSkyline(pointEvents.union(triggers.toDS()), nPart)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      val perTrigger =
        try {
          (1L to n / cadence).map { cyc =>
            val base = (cyc - 1) * cadence / subSize
            val t0 = System.nanoTime()
            points.addData(base until base + subBlocks)
            q.processAllAvailable()
            val ingestSec = (System.nanoTime() - t0) / 1e9
            val t1 = System.nanoTime()
            triggers.addData(
              StreamingSkyline.fanOutTrigger(s"$cyc,0", nPart,
                System.currentTimeMillis()))
            q.processAllAvailable()
            val querySec = (System.nanoTime() - t1) / 1e9
            val json = spark.table(name).as[String].collect()
              .find(_.contains("\"query_id\": \"" + cyc + "\""))
              .getOrElse(sys.error(s"no snapshot for trigger $cyc"))
            val size = "\"skyline_size\": ([0-9]+)".r
              .findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(-1L)
            val exp = oracle((cyc - 1).toInt)
            (cyc * cadence, ingestSec, querySec, size, exp)
          }
        } finally q.stop()

      val parity = perTrigger.forall { case (_, _, _, got, exp) => got == exp }
      val rows = perTrigger.map { case (pre, ing, qs, got, exp) =>
        f"""{"prefix":$pre,"ingest_sec":$ing%.2f,"query_sec":$qs%.2f,"skyline_size":$got,"batch_oracle":$exp}"""
      }.mkString("[", ",", "]")
      val total = perTrigger.map(t => t._2 + t._3).sum
      done += f"""{"dims":$dims,"n":$n,"cadence":$cadence,"parity":$parity,"total_sec":$total%.2f,"triggers":$rows}"""
      emit()
    }

    println(emit())
    spark.stop()
  }
}
