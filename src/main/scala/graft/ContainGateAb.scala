package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B of the `dedup_containment_clusters` gate
  * (round 17 — attributing the r16 bench regression 4.68 → 11.23 s min at
  * sf0.1, which landed the round the containment candidate stages moved to
  * hashed keys while the sibling `dedup_containment` gate barely moved):
  * per rep, BOTH key variants of
  * [[graft.operators.DedupOps.containmentNearDupsImpl]] run back-to-back —
  * the pair stage alone (the `dedup_containment` gate shape) and composed
  * with [[graft.operators.DedupOps.nearDupClusters]] (the
  * `dedup_containment_clusters` gate shape) — under the driver bench's
  * session config AS THE DRIVER RUNS IT (cpus/shuffle 32 — note
  * Bench.scala's own env DEFAULT is 4; pin SPARK_GRAFT_CPUS identically
  * when comparing absolute wall-clocks across the two harnesses) and the
  * bench's cache hygiene (count, unpersistPipelines, clearCache per
  * measurement). `dedup_jaccard` rides along as a third lane (no key
  * knob — it is in the same attribution ask). Counts are REQUIRED
  * identical across variants and reps (enforced, the sibling benches'
  * contract); wall-clock is reported per position so a box drift inside
  * the run is visible, and the variant ORDER alternates per rep so the
  * first-slot warm-up penalty lands on each variant equally often
  * (min-of-reps is position-deconfounded).
  *
  * Run: `sbt -batch "runMain graft.ContainGateAb"` (env knobs:
  * SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_SCALE_REPS,
  * SPARK_GRAFT_SCALE_OUT=CONTAIN_AB_out.json).
  */
object ContainGateAb {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def dd = spark.read.parquet(s"$sfDir/documents.parquet")
    // Bench.scala's per-measurement hygiene, replicated exactly.
    def cleanup(): Unit = {
      graft.operators.DedupOps.unpersistPipelines()
      spark.catalog.clearCache()
    }
    def timed(body: => Long): (Double, Long) = {
      val t = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t) / 1e9
      cleanup()
      (sec, n)
    }

    // The sf dir lands in the artifact JSON verbatim — validate before
    // the minutes-long runs (StreamDedupScaleBench's env-string rule).
    require(!sfDir.exists(c => c == '"' || c == '\\'),
      s"SPARK_GRAFT_SF_DIR is not JSON-safe to interpolate: $sfDir")

    // Warm-up (Bench.scala's discipline, incl. its try/catch): JVM/
    // codegen/scan setup lands here, not on whichever variant runs
    // first; a missing sf0.001 fixture must not kill the measurement.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    var counts: Option[(Long, Long, Long)] = None
    val rows = (0 until reps).flatMap { rep =>
      // ALTERNATE the variant order per rep (r18, ADVICE): a fixed order
      // would confound the first-position warm-up/cache penalty with the
      // variant effect — alternation puts each variant in each slot
      // equally often, so position and variant deconfound in the mins.
      (if (rep % 2 == 0) Seq(true, false) else Seq(false, true)).map { hashed =>
        val (pairSec, nPairs) = timed {
          graft.operators.DedupOps
            .containmentNearDupsImpl(dd, "doc_id", 3, 7, 10, hashed).count()
        }
        val (clSec, nCl) = timed {
          graft.operators.DedupOps.nearDupClusters(dd, "doc_id",
              graft.operators.DedupOps
                .containmentNearDupsImpl(dd, "doc_id", 3, 7, 10, hashed))
            .count()
        }
        val (jSec, nJ) = timed {
          graft.operators.DedupOps.jaccardNearDups(dd, "doc_id", 3, 1, 2)
            .count()
        }
        // The harness's validity contract: both key variants and every
        // rep must see the same pair/row/jaccard counts — a divergence is
        // a correctness regression, not a timing result, so fail loudly
        // instead of writing a normal-looking artifact.
        val c = (nPairs, nCl, nJ)
        require(counts.forall(_ == c),
          s"variant counts diverged: ${counts.get} vs $c (rep=$rep hashed=$hashed)")
        counts = Some(c)
        f"""{"rep":$rep,"hashed":$hashed,"pair_sec":$pairSec%.2f,"n_pairs":$nPairs,"cluster_sec":$clSec%.2f,"n_rows":$nCl,"jaccard_sec":$jSec%.2f,"n_jaccard":$nJ}"""
      }
    }
    val line = s"""{"metric":"contain_gate_ab","sf_dir":"$sfDir","rows":${rows.mkString("[", ",", "]")}}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "CONTAIN_AB_out.json")), line)
    spark.stop()
  }
}
