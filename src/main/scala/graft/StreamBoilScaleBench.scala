package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-boilerplate scale envelope: throughput and state boundedness
  * of the ingestion-time template detector
  * ([[graft.streaming.StreamBoilerplate.flagBoilerSpans]]) — the
  * [[StreamDedupScaleBench]] harness with a PLANTED GLOBAL TEMPLATE
  * instead of pairwise near-dups, because doc-frequency semantics need a
  * span seen in ≥ minDocs DISTINCT documents to fire at all.
  *
  * Corpus: 24-token docs from a 4k hash vocabulary; every 10th doc
  * (doc_id % 10 == 9) opens with the same fixed 10-token template, so
  * its k=8 windows at positions 0..2 sit fully inside the template and
  * recur corpus-wide while every other window is hash-unique. Under
  * first-crossing semantics with minDocs=3, the first two template docs
  * stream through unflagged and every later one flags exactly its 3
  * template windows: expected flags = 3 × (n/10 − 2) — an exact count
  * the cell asserts against, like the dedup harness's planted 15.
  *
  * JSON per cell: ingest wall seconds, docs/sec, total spans, flagged vs
  * expected, and the final state-store row count (must track DISTINCT
  * spans in the horizon, ~17 per doc + 3 shared, for the "runs forever"
  * claim). Knobs: SPARK_GRAFT_CPUS, SPARK_GRAFT_SCALE_NS,
  * SPARK_GRAFT_SCALE_OUT, SPARK_GRAFT_STATE_PROVIDER=rocksdb (same
  * provider swap as the dedup harness).
  */
object StreamBoilScaleBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ns = sys.env.getOrElse("SPARK_GRAFT_SCALE_NS", "300000,1000000")
      .split(",").map(_.trim.toLong).toSeq
    val blocks = 10
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    if (sys.env.getOrElse("SPARK_GRAFT_STATE_PROVIDER", "default") == "rocksdb") {
      builder
        .config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
          "true")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cells = ns.map { n =>
      val blockSz = n / blocks
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val feed = MemoryStream[Int]
      val isTpl = pmod(col("doc_id"), lit(10L)) === 9
      val docs = feed.toDF().select(
          explode(sequence(col("value").cast("long") * blockSz,
            (col("value").cast("long") + 1) * blockSz - 1)).as("doc_id"),
          col("value"))
        .select(col("doc_id"),
          timestamp_seconds(lit(1700000000L) + col("value") * 60L).as("ts"),
          concat_ws(" ", (0 until 24).map { j =>
            val own = concat(lit("w"),
              pmod(xxhash64(col("doc_id"), lit(j)), lit(4096L)).cast("string"))
            if (j < 10) when(isTpl, lit(s"t$j")).otherwise(own)
            // Position 10 is DOC-UNIQUE for template docs: a k=8 window at
            // position 3 carries 7 template tokens + token 10 — from a 4k
            // hash vocabulary that window recurs across ~m/4096 template
            // docs and crosses minDocs on its own (measured +24% over the
            // planted expectation); a unique token pins every
            // template-crossing window's df at 1, so flagged == 3·(m−2)
            // exactly.
            else if (j == 10)
              when(isTpl, concat(lit("u"), col("doc_id").cast("string")))
                .otherwise(own)
            else own
          }: _*).as("text"))
      val out = graft.streaming.StreamBoilerplate.flagBoilerSpans(
        docs, "doc_id", "ts", 8, 3, "600 minutes")
      var flagged = 0L
      var total = 0L
      val q = out.toDF().writeStream
        .outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val r = df.agg(count(lit(1)),
            sum(when(col("boiler"), 1L).otherwise(0L))).head()
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
        q.stop()
      }
      val stateRows = Option(q.lastProgress)
        .flatMap(p => p.stateOperators.headOption)
        .map(_.numRowsTotal).getOrElse(-1L)
      val expFlagged = 3L * (n / 10 - 2)
      f"""{"n":$n,"ingest_sec":$ingestSec%.2f,"docs_per_sec":${(n / ingestSec).toLong},"spans":$total,"flagged":$flagged,"exp_flagged":$expFlagged,"state_rows":$stateRows}"""
    }

    val line =
      s"""{"metric":"scale_stream_boiler","cells":${cells.mkString("[", ",", "]")},"template_share":0.1,"k":8,"min_docs":3,"blocks":10}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "SCALE_SBOIL_out.json")), line)
    spark.stop()
  }
}
