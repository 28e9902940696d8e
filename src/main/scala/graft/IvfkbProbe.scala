package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Storage/GC readout of the trained-IVF (`ivfkb`) 10M BUILD heap
  * sensitivity (round 18 — the r17 scaladoc attributed the 350 s @16g vs
  * 159 s @24g cliff to "MemoryStore evicts the persisted cells frame and
  * the assignment recomputes", but `Caches.persistTracked` is
  * MEMORY_AND_DISK: an evicted block SPILLS, it does not recompute, so the
  * stated mechanism cannot be right as written; this probe reads the real
  * one out of the task metrics instead of guessing).
  *
  * One invocation = one (heap × persist-level) configuration — the heap is
  * a JVM-wide property, so the A/B matrix runs as four JVM invocations:
  * SPARK_DRIVER_MEM={16g,24g} × SPARK_GRAFT_PERSIST_LEVEL=
  * {MEMORY_AND_DISK,MEMORY_AND_DISK_SER} (the level knob reroutes every
  * [[graft.core.Caches.persistTracked]] — the quantized corpus AND the
  * cells frame, the two corpus-sized caches in this build). Per rep the
  * probe times the full-scan `ivfModel` build (train 3 iters + cells
  * materialization — the envelope leg's metric), then records:
  *
  *   - per-stage task metrics (executorRunTime, jvmGCTime,
  *     memory/diskBytesSpilled), totals plus the top stages by run time —
  *     recompute shows up as EXTRA STAGES/run-time, GC thrash as gcMs
  *     approaching runMs, spill pressure as disk bytes;
  *   - the post-build MemoryStore census (`getRDDStorageInfo`: cached
  *     partitions, memSize vs diskSize per cached RDD) — direct evidence
  *     of where each cache's blocks actually sit at this heap;
  *   - heap actually granted (Runtime.maxMemory) + the storage-memory
  *     ceiling (`getExecutorMemoryStatus`).
  *
  * Caveat (the ProfileOps snapshot rule): task jvmGCTime is the JVM-wide
  * GC clock delta over each task's span, so concurrent tasks multiply-
  * count shared pauses — gc_ms is a RELATIVE pressure signal between
  * configurations, not attributable milliseconds.
  *
  * Run: `SPARK_DRIVER_MEM=16g sbt -batch "runMain graft.IvfkbProbe"`
  * (env knobs: SPARK_GRAFT_SCALE_NS=10000000, SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_SCALE_REPS=2, SPARK_GRAFT_PERSIST_LEVEL,
  * SPARK_GRAFT_SCALE_OUT=IVFKB_PROBE_out.json).
  */
object IvfkbProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_NS", "10000000").trim.toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt
    val level = sys.env.getOrElse("SPARK_GRAFT_PERSIST_LEVEL", "MEMORY_AND_DISK")
    require(!level.exists(c => c == '"' || c == '\\'), s"level not JSON-safe: $level")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // (stageId, sanitized name, runMs, gcMs, spillMemB, spillDiskB) per
    // completed stage; drained per rep. Listener events are async — each
    // rep sleeps briefly before draining so the final stages land.
    final case class StageRow(id: Int, name: String, runMs: Long, gcMs: Long,
                              spillMem: Long, spillDisk: Long)
    val stages = new ConcurrentLinkedQueue[StageRow]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        stages.add(StageRow(
          e.stageInfo.stageId,
          e.stageInfo.name.takeWhile(_ != '\n').take(60)
            .replaceAll("""[^A-Za-z0-9 _.:$()\[\]-]""", ""),
          m.executorRunTime, m.jvmGCTime,
          m.memoryBytesSpilled, m.diskBytesSpilled))
      }
    })

    val embs = VectorScaleBench
      .clusteredEmbs(spark, n, cpus.toInt * 4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    embs.count()

    val repRows = (0 until reps).map { rep =>
      Thread.sleep(500); stages.clear() // generation/previous-rep stages out
      val t0 = System.nanoTime()
      val mf = graft.operators.VectorOps.ivfModel(
        embs, "vec_id", "embedding",
        col("vec_id") >= 1000L && col("vec_id") < 1064L, 3,
        VectorScaleBench.Dims)
      val nCells = mf.cells.count()
      val buildSec = (System.nanoTime() - t0) / 1e9
      // Storage census BEFORE release: where the two tracked caches sit.
      val storage = spark.sparkContext.getRDDStorageInfo.filter(_.isCached)
        .sortBy(-_.memSize).map { i =>
          val nm = i.name.takeWhile(_ != '\n').take(50)
            .replaceAll("""[^A-Za-z0-9 _.:$()\[\]-]""", "")
          s"""{"rdd":"$nm","parts":${i.numPartitions},""" +
            s""""cached_parts":${i.numCachedPartitions},""" +
            s""""mem_mb":${i.memSize >> 20},"disk_mb":${i.diskSize >> 20}}"""
        }
      Thread.sleep(500)
      val rows = {
        import scala.jdk.CollectionConverters._
        stages.asScala.toSeq
      }
      val top = rows.sortBy(-_.runMs).take(8).map(r =>
        s"""{"stage":${r.id},"name":"${r.name}","run_ms":${r.runMs},""" +
          s""""gc_ms":${r.gcMs},"spill_mem_mb":${r.spillMem >> 20},""" +
          s""""spill_disk_mb":${r.spillDisk >> 20}}""")
      graft.core.Caches.releaseAll()
      (f"""{"rep":$rep,"build_sec":$buildSec%.2f,"n_cells":$nCells,""" +
        s""""run_ms":${rows.map(_.runMs).sum},"gc_ms":${rows.map(_.gcMs).sum},""" +
        s""""spill_mem_mb":${rows.map(_.spillMem).sum >> 20},""" +
        s""""spill_disk_mb":${rows.map(_.spillDisk).sum >> 20},""" +
        s""""storage":${storage.mkString("[", ",", "]")},""" +
        s""""top_stages":${top.mkString("[", ",", "]")}}""", nCells)
    }
    require(repRows.map(_._2).distinct.size == 1,
      s"rep cell counts diverged: ${repRows.map(_._2)}")

    val maxMem = spark.sparkContext.getExecutorMemoryStatus.values
      .map(_._1).sum
    val line =
      s"""{"metric":"ivfkb_probe","n":$n,"level":"$level",""" +
        s""""heap_mb":${Runtime.getRuntime.maxMemory() >> 20},""" +
        s""""storage_ceiling_mb":${maxMem >> 20},""" +
        s""""reps":${repRows.map(_._1).mkString("[", ",", "]")}}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "IVFKB_PROBE_out.json")), line)
    spark.stop()
  }
}
