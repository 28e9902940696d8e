package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming embedding-dedup scale envelope: throughput and state
  * boundedness of the ingestion-time semantic filter
  * ([[graft.streaming.StreamEmbDedup.flagNearDups]]) — the
  * [[StreamDedupScaleBench]] harness over VECTORS.
  *
  * Corpus: every vector is EXACTLY its slot center (64-d hash-derived,
  * slot = id % m with m = n/10 distinct slots), so the stream carries 10
  * copies of each of m distinct vectors. Under first-kept semantics at
  * minCos 0.999 the first arrival of each slot passes and seeds its
  * bucket's keep-set; every later copy is cosine-1 to it and flags:
  * expected flags = n − m EXACTLY, and the keep-set is bounded by the m
  * distinct slots (~51 MB of state at 1M rows), never the stream —
  * the boundedness the twin claims. `cap` is sized above the maximum
  * slots-per-bucket occupancy so saturation never steals a flag from
  * the expectation — and occupancy is NOT hash-uniform: plane-sign
  * buckets skew toward popular sign patterns (a first run at cap 4096
  * measured exactly 1,666 slots unadmitted in the hottest buckets at
  * m = 100k → 14,994 of 900,000 expected flags traded — the documented
  * saturation contract doing its job; 16384 clears the observed skew).
  *
  * JSON per cell: ingest wall seconds, vectors/sec, flagged vs expected,
  * and the state-store row count (= occupied buckets ≤ 2^bits). Knobs:
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_SCALE_NS, SPARK_GRAFT_SCALE_OUT,
  * SPARK_GRAFT_STATE_PROVIDER=rocksdb.
  *
  * A second leg ("multi", SPARK_GRAFT_SCALE_LEGS) measures the
  * MULTI-TABLE twin ([[graft.streaming.StreamEmbDedup.flagNearDupVotes]])
  * on a NOISY corpus — copies deviate ~2° from their slot center, so
  * single-table sign-bucket blocking misses a measurable fraction — and
  * reports the recall lift of tables = 2 over tables = 1 at the measured
  * state / throughput cost, plus each run's saturation counter (the
  * cap-rejection visibility surface). The per-arrival OR consolidates
  * batch-locally in foreachBatch (all of an arrival's votes share its
  * micro-batch by construction).
  */
object StreamEmbScaleBench {

  private val Dims = 64
  private val Bits = 12

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

    val legFilter = sys.env.getOrElse("SPARK_GRAFT_SCALE_LEGS", "exact,multi")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    // first/min protocol (round 16): ingest wall swings with page-cache/
    // GC phase while flag counts, state rows, and saturation are exact
    // (flagging is order-independent on these corpora: all copies of a
    // slot are mutually above threshold, so WHICH copy seeds the bucket
    // never changes a flag count) — each leg runs `reps` independent
    // queries, counts REQUIRED identical, JSON carries first AND min.
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt
    def timedRuns[T](body: => (Double, T)): (Double, Double, T) = {
      var first = 0.0; var best = Double.MaxValue; var out: Option[T] = None
      for (i <- 0 until reps) {
        val (sec, r) = body
        require(out.forall(_ == r), s"rep counts diverged: $out vs $r")
        out = Some(r)
        if (i == 0) first = sec
        best = math.min(best, sec)
      }
      (first, best, out.get)
    }
    val cells = (if (legFilter("exact")) ns else Seq.empty[Long]).map { n =>
      val m = n / 10
      val blockSz = n / blocks
      val (ingestFirst, ingestMin, (total, flagged, stateRows)) = timedRuns {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val feed = MemoryStream[Int]
      val slot = pmod(col("vec_id"), lit(m))
      val vec = transform(sequence(lit(0), lit(Dims - 1)), i =>
        ((pmod(xxhash64(lit(31), slot, i), lit(2001L)).cast("double") /
          lit(1000.0)) - lit(1.0)).cast("float"))
      val docs = feed.toDF().select(
          explode(sequence(col("value").cast("long") * blockSz,
            (col("value").cast("long") + 1) * blockSz - 1)).as("vec_id"),
          col("value"))
        .select(col("vec_id"),
          timestamp_seconds(lit(1700000000L) + col("value") * 60L).as("ts"),
          vec.as("embedding"))
      val out = graft.streaming.StreamEmbDedup.flagNearDups(
        docs, "vec_id", "ts", "embedding", Bits, Dims, 0.999,
        cap = 16384, lateness = "600 minutes")
      var flagged = 0L
      var total = 0L
      val q = out.toDF().writeStream
        .outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val r = df.agg(count(lit(1)),
            sum(when(col("dup"), 1L).otherwise(0L))).head()
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
      val sr = Option(q.lastProgress)
        .flatMap(p => p.stateOperators.headOption)
        .map(_.numRowsTotal).getOrElse(-1L)
      (ingestSec, (total, flagged, sr))
      }
      val expFlagged = n - m
      f"""{"n":$n,"ingest_sec":$ingestMin%.2f,"ingest_first":$ingestFirst%.2f,"reps":$reps,"vecs_per_sec":${(n / ingestMin).toLong},"rows":$total,"flagged":$flagged,"exp_flagged":$expFlagged,"state_rows":$stateRows}"""
    }

    // Multi-table leg: noisy copies (center + ~2° deviation), tables 1
    // vs 2 — same denominator (every non-first copy of a slot is a true
    // near-dup), so flagged/exp IS the blocking recall and the lift is
    // the multi-table payoff the operator exists for.
    val multiCells = if (!legFilter("multi")) Seq.empty[String] else ns.map { n =>
      val m = n / 10
      val blockSz = n / blocks
      val runs = Seq(1, 2).map { tables =>
        val (tFirst, tMin, (tot, fl, st, sat)) = timedRuns {
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
        val feed = MemoryStream[Int]
        val slot = pmod(col("vec_id"), lit(m))
        // center(slot) ± 0.04-scaled per-id noise: ~2° off-center, so two
        // copies of one slot stay within cos ≥ ~0.997 of each other while
        // 12 sign bits split copy from seed ~10–15% of the time per table.
        val vec = transform(sequence(lit(0), lit(Dims - 1)), i =>
          (((pmod(xxhash64(lit(31), slot, i), lit(2001L)).cast("double") /
            lit(1000.0)) - lit(1.0)) +
            ((pmod(xxhash64(lit(37), col("vec_id"), i), lit(2001L))
              .cast("double") / lit(1000.0)) - lit(1.0)) * lit(0.04))
            .cast("float"))
        val docs = feed.toDF().select(
            explode(sequence(col("value").cast("long") * blockSz,
              (col("value").cast("long") + 1) * blockSz - 1)).as("vec_id"),
            col("value"))
          .select(col("vec_id"),
            timestamp_seconds(lit(1700000000L) + col("value") * 60L).as("ts"),
            vec.as("embedding"))
        val sat = spark.sparkContext.longAccumulator(s"semb_sat_t$tables")
        val out = graft.streaming.StreamEmbDedup.flagNearDupVotes(
          docs, "vec_id", "ts", "embedding", tables, Bits, Dims, 0.99,
          cap = 16384, lateness = "600 minutes", saturated = Some(sat))
        var flagged = 0L
        var total = 0L
        val q = out.toDF().writeStream
          .outputMode("append")
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            val r = df.groupBy("vec_id")
              .agg(max(col("dup")).as("dup"))
              .agg(count(lit(1)), sum(when(col("dup"), 1L).otherwise(0L)))
              .head()
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
          val _ = q.lastProgress
          q.stop()
        }
        val stateRows = Option(q.lastProgress)
          .flatMap(p => p.stateOperators.headOption)
          .map(_.numRowsTotal).getOrElse(-1L)
        (ingestSec, (total, flagged, stateRows, sat.value))
        }
        (tables, tFirst, tMin, tot, fl, st, sat)
      }
      val Seq((_, fst1, s1, tot1, f1, st1, sat1),
              (_, fst2, s2, tot2, f2, st2, sat2)) = runs
      assert(tot1 == n && tot2 == n, s"row loss: $tot1/$tot2 of $n")
      f"""{"n":$n,"exp_flagged":${n - m},"reps":$reps,""" +
        f""""t1_ingest_sec":$s1%.2f,"t1_ingest_first":$fst1%.2f,"t1_flagged":$f1,"t1_state_rows":$st1,"t1_saturated":$sat1,""" +
        f""""t2_ingest_sec":$s2%.2f,"t2_ingest_first":$fst2%.2f,"t2_flagged":$f2,"t2_state_rows":$st2,"t2_saturated":$sat2}"""
    }

    val line =
      s"""{"metric":"scale_stream_embdedup","cells":${cells.mkString("[", ",", "]")},""" +
        s""""multi_cells":${multiCells.mkString("[", ",", "]")},""" +
        s""""dims":$Dims,"bits":$Bits,"copies_per_slot":10,"blocks":10}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "SCALE_SEMB_out.json")), line)
    spark.stop()
  }
}
