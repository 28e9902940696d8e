package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-dedup scale envelope: throughput and STATE BOUNDEDNESS of
  * the ingestion-time sub-document filter
  * ([[graft.streaming.StreamSubstrDedup.flagDupSpans]]) over the same
  * planted-dup corpus as [[DedupScaleBench]], fed as a stream of block
  * indices flatMapped executor-side to documents (the driver never holds
  * a document — the [[StreamScaleBench]] feed discipline).
  *
  * Per scale n: `blocks` micro-batches of n/blocks docs each (base docs
  * first, the 10% near-dup tail in the last blocks — so every dup's base
  * has already streamed through, the regime an ingestion filter sees),
  * each k=8 window flagged against stream history. The JSON records per
  * cell: ingest wall seconds, docs/sec, flagged instance count next to
  * the expected planted count (15 shared windows per dup doc — base/dup
  * pairs share their 22-token prefix), and the state-store row count
  * from the query's final progress — the number that must track DISTINCT
  * spans in the horizon (~17 per doc), not stream length, for the
  * "runs forever" claim to hold.
  *
  * Run: `sbt -batch "runMain graft.StreamDedupScaleBench"` (env knobs:
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_SCALE_NS="300000,1000000",
  * SPARK_GRAFT_SCALE_OUT=SCALE_SDEDUP_out.json). Heap note: the state
  * store keeps one entry per distinct span in the horizon (md5-hex key +
  * boolean) — size SPARK_DRIVER_MEM for ~100 B × 17 × n (the 8g default
  * OOMed the 1M leg on a loaded box in r16; 16g held), and use
  * SPARK_GRAFT_STATE_PROVIDER=rocksdb past ~2M docs — the r16 3M leg ran
  * 46.5M state rows off-heap at 16k docs/s where the on-heap map would
  * not fit (note: RocksDB native teardown can abort the JVM AFTER the
  * artifact is written at that state size; the measurement is complete).
  */
object StreamDedupScaleBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ns = sys.env.getOrElse("SPARK_GRAFT_SCALE_NS", "300000,1000000")
      .split(",").map(_.trim.toLong).toSeq
    val blocks = 10
    // State-store provider knob: the default HDFS-backed store keeps the
    // whole key→value map on-heap and snapshots it per maintenance
    // interval — per-batch cost picks up an O(total state) component as
    // the horizon fills (the measured 5.7k→3.7k docs/s slide at 300k→1M).
    // SPARK_GRAFT_STATE_PROVIDER=rocksdb swaps in the RocksDB provider
    // with changelog checkpointing: per-batch work tracks the batch's
    // UPDATES (the changelog), not the store size.
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    val provider = sys.env.getOrElse("SPARK_GRAFT_STATE_PROVIDER", "default")
    if (provider == "rocksdb") {
      builder
        .config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
          "true")
    }
    // Maintenance-cadence knob (seconds): the HDFS-backed provider's
    // maintenance pass snapshots the WHOLE in-memory map (O(total state),
    // default every 60 s — ~2 full 15.5M-row snapshots land inside the 1M
    // ingest window, competing for the same 32 cores); raising the
    // interval past the run length defers snapshotting to idle time — the
    // recovery-time-vs-ingest-throughput trade a deployment tunes.
    sys.env.get("SPARK_GRAFT_STATE_MAINT").foreach(s =>
      builder.config("spark.sql.streaming.stateStore.maintenanceInterval",
        s + "s"))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // first/min protocol (round 16 — the batch benches' timedN, adopted
    // here after r15's single-sample lever claims): ingest wall swings
    // with page-cache/GC phase while flag counts and state rows are
    // exact, so each cell runs `reps` independent queries (fresh
    // MemoryStream + checkpoint each), counts REQUIRED identical, and
    // the JSON carries first AND min ingest seconds.
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt

    // The artifact's state-store self-description (written at the bottom):
    // the EFFECTIVE maintenance interval with its unit (the config above
    // appends "s"; unset means Spark's 60s default, not "default"), both
    // values validated BEFORE the hour-scale runs — a quote or backslash
    // in an env value would otherwise emit invalid JSON after the fact.
    val maint = sys.env.get("SPARK_GRAFT_STATE_MAINT")
      .map(_ + "s").getOrElse("60s")
    Seq("provider" -> provider, "maintenance_interval" -> maint).foreach {
      case (k, v) => require(v.matches("[A-Za-z0-9_.-]+"),
        s"$k value is not JSON-safe to interpolate: $v")
    }

    val cells = ns.map { n =>
      val nBase = (n * 9) / 10
      val blockSz = n / blocks
      def runOnce(): (Double, (Long, Long, Long)) = {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val feed = MemoryStream[Int]
      // Block b → ids [b*blockSz, (b+1)*blockSz); same generator as
      // DedupScaleBench: 24 words from a 4k vocab, hash-distinct streams
      // per seed, dups re-seeded from their base with the last 2 words
      // perturbed. ts advances one minute per block; watermark far behind
      // so nothing evicts inside the run (boundedness is read from the
      // state row count, eviction is spec-tested).
      val docs = feed.toDF().select(
          explode(sequence(col("value").cast("long") * blockSz,
            (col("value").cast("long") + 1) * blockSz - 1)).as("doc_id"),
          col("value"))
        .select(col("doc_id"),
          timestamp_seconds(lit(1700000000L) + col("value") * 60L).as("ts"),
          when(col("doc_id") < nBase, col("doc_id"))
            .otherwise((col("doc_id") - nBase) * 9L).as("seed"),
          (col("doc_id") >= nBase).as("isdup"))
        .select(col("doc_id"), col("ts"), concat_ws(" ",
          (0 until 24).map { j =>
            val base = concat(lit("w"),
              pmod(xxhash64(col("seed"), lit(j)), lit(4096L)).cast("string"))
            if (j >= 22)
              when(col("isdup"),
                concat(lit("p"), pmod(col("doc_id"), lit(97L)).cast("string")))
                .otherwise(base)
            else base
          }: _*).as("text"))
      val out = graft.streaming.StreamSubstrDedup.flagDupSpans(
        docs, "doc_id", "ts", 8, "600 minutes")
      // foreachBatch count sink: only two longs per micro-batch reach the
      // driver, never the flagged rows.
      var flagged = 0L
      var total = 0L
      val q = out.toDF().writeStream
        .outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val r = df.agg(count(lit(1)), sum(when(col("dup"), 1L).otherwise(0L))).head()
          total += r.getLong(0)
          flagged += (if (r.isNullAt(1)) 0L else r.getLong(1))
        }
        .start()
      val t0 = System.nanoTime()
      val ingestSec = try {
        (0 until blocks).foreach { b =>
          feed.addData(b)
          q.processAllAvailable()
        }
        (System.nanoTime() - t0) / 1e9
      } finally {
        val _ = q.lastProgress // touch before stop
        // stop() inside the finally: a throw from addData/
        // processAllAvailable must not leak a running query (the bench
        // process would hang on the next cell's fresh query otherwise).
        q.stop()
      }
      val stateRows = Option(q.lastProgress)
        .flatMap(p => p.stateOperators.headOption)
        .map(_.numRowsTotal).getOrElse(-1L)
      (ingestSec, (total, flagged, stateRows))
      }
      var first = 0.0; var best = Double.MaxValue
      var counts: Option[(Long, Long, Long)] = None
      for (i <- 0 until reps) {
        val (sec, c) = runOnce()
        require(counts.forall(_ == c), s"rep counts diverged: $counts vs $c")
        counts = Some(c)
        if (i == 0) first = sec
        best = math.min(best, sec)
      }
      val (total, flagged, stateRows) = counts.get
      val expFlagged = (n - nBase) * 15L
      f"""{"n":$n,"ingest_sec":$best%.2f,"ingest_first":$first%.2f,"reps":$reps,"docs_per_sec":${(n / best).toLong},"spans":$total,"flagged":$flagged,"exp_flagged":$expFlagged,"state_rows":$stateRows}"""
    }

    // The artifact self-describes its state-store config (provider/maint
    // validated above, before the runs): r16 runs the default-provider
    // cells and the RocksDB big-horizon cell as separate artifacts, and a
    // bare cells array would leave the provider ambiguous.
    val line =
      s"""{"metric":"scale_stream_dedup","cells":${cells.mkString("[", ",", "]")},"planted_dup_share":0.1,"k":8,"blocks":10,""" +
        s""""provider":"$provider","maintenance_interval":"$maint"}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "SCALE_SDEDUP_out.json")), line)
    spark.stop()
  }
}
