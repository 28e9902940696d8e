package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SkylineOps._
import graft.sources.DataGenSource

/** Reproduces the reference's published scalability envelope
  * (`project_documentation.pdf` p.17 §5.2, BASELINE.md: "linear up to 10M
  * records 2D/3D, total time < 400 s", anti-correlated) with this engine's
  * own generator and the full MR-parity pipeline — geometric partition →
  * local skyline → global merge ([[graft.operators.SkylineOps.mrSkylinePoints]])
  * plus the optimality metric and the emitted JSON record, per strategy
  * (MR-Dim / MR-Grid / MR-Angle).
  *
  * Method: for each (dims, n) cell the anti-correlated stream is generated
  * distributedly (partition-invariant md5 generator — DataGenSource), cached
  * and materialized once (the "ingestion" analog, timed separately), then
  * each strategy is timed end-to-end on the reference's per-trigger unit of
  * work: the emitted metrics record (`metricsJson`), which carries
  * record_count, skyline_size AND the D4 optimality in one pipeline —
  * exactly what one reference trigger computes from its materialized local
  * skylines (`FlinkSkyline.java:590-650`). The distinct frontier is counted
  * once per cell (strategy-invariant — the MR merge property) as the
  * skyline-cardinality column. Linearity is demonstrated by running the same
  * cells at 1M and 10M; the 1M 2D cell is also the direct comparison row
  * against BASELINE.md's numbers (MR-Dim/Grid/Angle 19.5/17.6/17.3 s).
  *
  * Run: `sbt -batch "runMain graft.ScaleBench"` (env knobs:
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_SCALE_NS="1000000,10000000",
  * SPARK_GRAFT_SCALE_DIMS="2,3", SPARK_GRAFT_SCALE_NPARTS="8",
  * SPARK_GRAFT_SCALE_OUT=SCALE_out.json).
  *
  * SPARK_GRAFT_SCALE_NPARTS takes a LIST to replicate the reference's
  * optimality-degradation matrix (`graph_paper_figures.py:38-42`, pdf
  * p.19 §5.4: optimality falls as partitions rise, angle flattest):
  * each (dims, n) cell re-times every strategy at every partition count
  * over the SAME cached stream, so the matrix is one generation pass per
  * cell. The distinct frontier is partition-count-invariant (MR merge
  * property) and so counted once per (dims, n).
  */
object ScaleBench {

  private def dimCols(dims: Int): Seq[String] =
    Seq("x", "y", "z", "w").take(dims)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ns = sys.env.getOrElse("SPARK_GRAFT_SCALE_NS", "1000000,10000000")
      .split(",").map(_.trim.toLong).toSeq
    val dimsList = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIMS", "2,3")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nParts = sys.env.getOrElse("SPARK_GRAFT_SCALE_NPARTS", "8")
      .split(",").map(_.trim.toInt).toSeq // gate/report default (SURVEY §2.3)
    val dMax = 10000         // the reference producer's domain
    val cells = for (dims <- dimsList; n <- ns) yield (dims, n)

    val rows = cells.flatMap { case (dims, n) =>
      val names = dimCols(dims)
      val raw = DataGenSource.pointsDF(spark, "anti_correlated", 42L, n, dims,
          0, dMax, numPartitions = cpus.toInt * 4)
        .select(names.zipWithIndex.map { case (c, i) => col("values")(i).as(c) }: _*)
      val df = raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t0 = System.nanoTime()
      df.count()
      val genSec = (System.nanoTime() - t0) / 1e9

      val vecCol = array(names.map(col): _*)

      // Strategy- AND partition-count-invariant distinct frontier
      // cardinality (MR merge property; asserted equal across strategies
      // by the mr*_sky2d gates) — counted once per (dims, n).
      val t1 = System.nanoTime()
      val skyPoints = mrSkylinePoints(df, names,
        dimPartitionCol(vecCol, dMax.toDouble, nParts.head)).count()
      val skySec = (System.nanoTime() - t1) / 1e9

      val perNp = nParts.map { nPart =>
        val strategies: Seq[(String, Column)] = Seq(
          "mrdim"   -> dimPartitionCol(vecCol, dMax.toDouble, nPart),
          "mrgrid"  -> gridPartitionCol(vecCol, dims, dMax.toDouble, nPart),
          "mrangle" -> anglePartitionCol(vecCol, dims, nPart))
        val perStrategy = strategies.map { case (strat, pid) =>
          val t2 = System.nanoTime()
          val rec = metricsRecord(df, names, pid, nPart)
          val sec = (System.nanoTime() - t2) / 1e9
          (strat, sec, rec)
        }
        (nPart, perStrategy)
      }
      df.unpersist(blocking = true)
      perNp.map { case (nPart, per) =>
        (dims, n, nPart, genSec, skyPoints, skySec, per)
      }
    }

    val json = rows.map { case (dims, n, nPart, genSec, skyPoints, skySec, per) =>
      val ps = per.map { case (s, sec, rec) =>
        val opt = "\"optimality\": ([0-9.]+)".r.findFirstMatchIn(rec).map(_.group(1)).getOrElse("-1")
        val ss = "\"skyline_size\": ([0-9]+)".r.findFirstMatchIn(rec).map(_.group(1)).getOrElse("-1")
        f"""\"$s\":{\"sec\":$sec%.2f,\"skyline_rows\":$ss,\"optimality\":$opt}"""
      }.mkString(",")
      f"""{\"dims\":$dims,\"n\":$n,\"npart\":$nPart,\"gen_sec\":$genSec%.2f,\"sky_points\":$skyPoints,\"sky_sec\":$skySec%.2f,$ps,\"total_sec\":${skySec + per.map(_._2).sum}%.2f}"""
    }.mkString("[", ",", "]")
    val line = s"""{"metric":"scale_envelope","cells":$json,"nparts":${nParts.mkString("[", ",", "]")},"distribution":"anti_correlated"}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "SCALE_out.json")), line)
    spark.stop()
  }

  /** The emitted-record leg of the pipeline (timed inside each strategy):
    * materializes the reference-format JSON record for the cell. */
  private def metricsRecord(df: DataFrame, dims: Seq[String],
                            pid: Column, nPart: Int): String =
    metricsJson(df, dims, pid, nPart, "1").collect().head.getString(0)
}
