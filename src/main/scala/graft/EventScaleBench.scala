package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale envelope for the behavioral-analytics family (the round-8
  * additions): funnel, retention, and session-transition matrix over a
  * synthetic event stream at 1M and 10M rows — the linearity evidence
  * that the three shuffle shapes (chained conditional-min + frontier
  * joins; distinct + cohort join; per-user window/lag) hold at 10×.
  *
  * The stream is generated distributedly from `spark.range` arithmetic
  * (100k users, 5 event types cycling per user, pseudo-uniform
  * microsecond times over 30 days) — deterministic, partition-invariant,
  * no driver-side data. This is a WALL-CLOCK envelope, not a
  * correctness gate (the operators' correctness is oracle-gated at
  * sf0.01 by `evt_funnel` / `evt_retention` / `evt_transitions`).
  *
  * Run: `sbt -batch "runMain graft.EventScaleBench"` (env knobs:
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_SCALE_NS="1000000,10000000",
  * SPARK_GRAFT_SCALE_OUT=SCALE_EVENTS_out.json).
  */
object EventScaleBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ns = sys.env.getOrElse("SPARK_GRAFT_SCALE_NS", "1000000,10000000")
      .split(",").map(_.trim.toLong).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val spanUs = 30L * 86400000000L
    val types = array(lit("view"), lit("click"), lit("purchase"),
      lit("error"), lit("signup"))

    val cells = ns.map { n =>
      // BURSTY structure, like real activity logs: each user's events come
      // in 5-event bursts 5 minutes apart (intra-session transitions and
      // funnel conversions exist), with burst starts Knuth-scattered over
      // the 30-day span (cohort/retention structure exists). A uniform
      // scatter would put ~hours between a user's consecutive events —
      // every event its own session, zero transitions; a small stride
      // would park everything on day 0 — one retention cell.
      val ev = spark.range(0, n, 1, cpus.toInt * 4).select(
          pmod(col("id"), lit(100000L)).as("user_id"),
          col("id").as("event_id"),
          // Staged modulus keeps every product under 2^63 (ANSI mode
          // faults on overflow — no wrap-as-hash tricks).
          (pmod(pmod(pmod(col("id"), lit(100000L)) * 1000003L +
                expr("(id div 100000) div 5") * 777767777L,
              lit(3474749660383L)) * 100003L,
            lit(spanUs - 3600000000L)) +
            pmod(expr("id div 100000"), lit(5L)) * 300000000L).as("us"),
          element_at(types,
            (pmod(expr("id div 100000"), lit(5L)) + 1).cast("int")).as("event_type"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t0 = System.nanoTime()
      ev.count()
      val genSec = (System.nanoTime() - t0) / 1e9

      def time(body: => Long): (Long, Double) = {
        val t = System.nanoTime()
        val rows = body
        (rows, (System.nanoTime() - t) / 1e9)
      }
      val (fRows, fSec) = time {
        graft.operators.EventOps.funnel(ev, "user_id", "us", "event_type",
          Seq("view", "click", "purchase")).collect()
        graft.core.Caches.releaseAll()
        3L
      }
      val (rRows, rSec) = time {
        val c = graft.operators.EventOps.retention(ev, "user_id", "us").count()
        graft.core.Caches.releaseAll()
        c
      }
      val (tRows, tSec) = time {
        PipelineLike.transitions(ev).count()
      }
      ev.unpersist(blocking = true)
      f"""{"n":$n,"gen_sec":$genSec%.2f,"funnel_sec":$fSec%.2f,"funnel_rows":$fRows,"retention_sec":$rSec%.2f,"retention_rows":$rRows,"transitions_sec":$tSec%.2f,"transitions_rows":$tRows}"""
    }

    val line =
      s"""{"metric":"scale_events","cells":${cells.mkString("[", ",", "]")},"users":100000}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "SCALE_EVENTS_out.json")), line)
    spark.stop()
  }

  /** The evt_transitions shape (sessionize + lead) over an arbitrary
    * event frame — same code the gate runs, parameterized here. */
  private object PipelineLike {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.expressions.Window
    def transitions(ev: DataFrame): DataFrame = {
      val gapUs = 1800L * 1000000L
      val wu = Window.partitionBy("user_id").orderBy("us", "event_id")
      val sess = ev
        .withColumn("brk",
          when(col("us") - lag("us", 1).over(wu) > gapUs, 1).otherwise(0))
        .withColumn("sid", sum("brk").over(wu))
      val ws = Window.partitionBy("user_id", "sid").orderBy("us", "event_id")
      sess.withColumn("nxt", lead("event_type", 1).over(ws))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("nxt").as("to_type"))
        .agg(count(lit(1)).as("cnt"))
    }
  }
}
