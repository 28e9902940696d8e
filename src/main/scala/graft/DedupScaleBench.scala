package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale envelope for the fuzzy-dedup family: MinHash banding →
  * candidate pairs → Jaccard verify → cluster collapse over synthetic
  * corpora at 1M and 10M documents — the evidence that the banded
  * (never all-pairs) candidate generation and the pointer-doubled
  * component collapse hold at 10×.
  *
  * The corpus is generated distributedly from `spark.range` arithmetic:
  * every document is 24 words drawn deterministically from a 4k-word
  * vocabulary; one document in 10 is a near-duplicate of a base document
  * (same word stream, last 2 words perturbed — shingle Jaccard well above
  * the 1/2 verify threshold), so planted pair/cluster structure EXISTS
  * and its volume is known to scale linearly with n. A degenerate corpus
  * (all docs identical, or no dups at all) would measure the wrong
  * regime. WALL-CLOCK envelope only — correctness of the same operators
  * is oracle-gated at sf0.01 (`dedup_minhash`, `dedup_clusters`).
  *
  * Run: `sbt -batch "runMain graft.DedupScaleBench"` (env knobs:
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_SCALE_NS="1000000,10000000",
  * SPARK_GRAFT_SCALE_OUT=SCALE_DEDUP_out.json; set SPARK_DRIVER_MEM=16g
  * for the 10M legs — the 8g default OOMed mid-chain on a loaded box in
  * r16).
  */
object DedupScaleBench {

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

    val cells = ns.map { n =>
      // doc i < 0.9n: 24 words seeded from i. doc i >= 0.9n: a near-dup of
      // base doc (i - 0.9n) * 9 — word stream re-seeded from the base id,
      // positions 22..23 perturbed (shared shingle Jaccard 20/24, well
      // above the 1/2 verify threshold). Word w(seed, j) =
      // vocab[xxhash64(seed, j) % 4096]: hash-distinct streams per seed —
      // a linear form in seed would alias whole documents mod the vocab
      // size and plant n²-scale accidental duplicates, measuring the
      // wrong regime entirely.
      val nBase = (n * 9) / 10
      val docs = spark.range(0, n, 1, cpus.toInt * 4).select(
          col("id").as("doc_id"),
          when(col("id") < nBase, col("id"))
            .otherwise((col("id") - nBase) * 9L).as("seed"),
          (col("id") >= nBase).as("isdup"))
        .select(col("doc_id"), concat_ws(" ",
          (0 until 24).map { j =>
            val base = concat(lit("w"),
              pmod(xxhash64(col("seed"), lit(j)), lit(4096L)).cast("string"))
            if (j >= 22)
              when(col("isdup"),
                concat(lit("p"), pmod(col("doc_id"), lit(97L)).cast("string")))
                .otherwise(base)
            else base
          }: _*).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t0 = System.nanoTime()
      docs.count()
      val genSec = (System.nanoTime() - t0) / 1e9

      // The 10 M legs swing with page-cache/GC phase on this box (the
      // SCALING.md method note), so at 10 M the WHOLE leg chain runs
      // twice — per-leg first AND min land in the JSON (Bench.scala's
      // protocol), counts are required identical across reps. Legs share
      // persisted intermediates within one rep exactly as before (pairs'
      // sr/sig stay warm for the cluster leg), so per-leg semantics match
      // the single-run protocol of earlier rounds.
      val reps = if (n >= 10000000L) 2 else 1
      final case class Legs(pairSec: Double, nPairs: Long,
                            clusterSec: Double, nClustered: Long,
                            substrSec: Double, docsCov: Long, tokCov: Long,
                            bpSec: Double, docsBp: Long, tokBp: Long,
                            containSec: Double, nContain: Long)
      def runLegs(): Legs = {
        // Full chain, the dedup_clusters shape: banding (b=12, r=3) →
        // verified pairs (Jaccard >= 1/2 over 3-shingles) → components.
        val t1 = System.nanoTime()
        val pairs = graft.operators.DedupOps.minhashNearDups(
          docs, "doc_id", 3, 12, 3, 1, 2)
        val nPairs = pairs.count()
        val pairSec = (System.nanoTime() - t1) / 1e9

        val t2 = System.nanoTime()
        val labels = graft.operators.DedupOps.nearDupClusters(
          docs, "doc_id", pairs)
        val nClustered = labels.filter(col("cluster") =!= col("doc_id")).count()
        val clusterSec = (System.nanoTime() - t2) / 1e9
        graft.operators.DedupOps.unpersistPipelines()

        // SUB-DOCUMENT leg (round 12): window-level coverage over the same
        // corpus — 17 positioned spans per doc (24 tokens, k=8), so the
        // span table is the biggest intermediate of the three legs and the
        // one that proves the shape at 10×. The planted near-dups share
        // their 22-word prefix, so windows 0..14 of every base/dup pair are
        // duplicated — coverage volume is known to scale linearly with n.
        val t3 = System.nanoTime()
        val covAgg = graft.operators.DedupOps
          .duplicatedSpanCoverage(docs, "doc_id", 8)
          .agg(sum(when(col("covered_tokens") > 0, 1L).otherwise(0L))
              .as("docs_cov"),
            sum(col("covered_tokens")).as("tok_cov")).head()
        val (docsCov, tokCov) = (covAgg.getLong(0), covAgg.getLong(1))
        val substrSec = (System.nanoTime() - t3) / 1e9

        graft.operators.DedupOps.unpersistPipelines()

        // BOILERPLATE leg (round 12, second wave): document-frequency
        // coverage at minDocs=2 over the same corpus. This corpus has no
        // self-repeats, so the result must EQUAL the occurrence-based
        // coverage leg — the envelope doubles as a cross-operator
        // consistency check at 10M (bp_tok_cov == covered_tokens), while
        // the cost measures the sh-keyed dedup exchange the operator adds.
        val t4 = System.nanoTime()
        val bpAgg = graft.operators.DedupOps
          .boilerplateCoverage(docs, "doc_id", 8, 2)
          .agg(sum(when(col("bp_covered_tokens") > 0, 1L).otherwise(0L))
              .as("docs_bp"),
            sum(col("bp_covered_tokens")).as("tok_bp")).head()
        val (docsBp, tokBp) = (bpAgg.getLong(0), bpAgg.getLong(1))
        val bpSec = (System.nanoTime() - t4) / 1e9
        graft.operators.DedupOps.unpersistPipelines()

        // CONTAINMENT leg (round 12, second wave): the rare-first
        // prefix ⋈ FULL shingle-rows candidate geometry (the r15
        // orientation/positional-filter variants measured slower and were
        // reverted — see containmentNearDups) — the one pairing shape in the
        // library whose cost is bounded by prefix-shingle document
        // frequency rather than banding or blocking. Planted pairs share
        // a 22-word prefix (containment 20/22 > 7/10), so the qualifying
        // pair volume is known to scale linearly with n.
        val t5 = System.nanoTime()
        val nContain = graft.operators.DedupOps
          .containmentNearDups(docs, "doc_id", 3, 7, 10).count()
        val containSec = (System.nanoTime() - t5) / 1e9
        graft.operators.DedupOps.unpersistPipelines()

        Legs(pairSec, nPairs, clusterSec, nClustered,
          substrSec, docsCov, tokCov, bpSec, docsBp, tokBp,
          containSec, nContain)
      }

      val runs = (0 until reps).map(_ => runLegs())
      val first = runs.head
      require(runs.forall(r => (r.nPairs, r.nClustered, r.docsCov, r.tokCov,
          r.docsBp, r.tokBp, r.nContain) ==
          ((first.nPairs, first.nClustered, first.docsCov, first.tokCov,
            first.docsBp, first.tokBp, first.nContain))),
        s"rep counts diverged: $runs")
      def mn(f: Legs => Double): Double = runs.map(f).min

      docs.unpersist(blocking = true)
      f"""{"n":$n,"gen_sec":$genSec%.2f,"reps":$reps,""" +
        f""""pairs_sec":${mn(_.pairSec)}%.2f,"pairs_first":${first.pairSec}%.2f,"n_pairs":${first.nPairs},""" +
        f""""cluster_sec":${mn(_.clusterSec)}%.2f,"cluster_first":${first.clusterSec}%.2f,"n_clustered":${first.nClustered},""" +
        f""""substr_sec":${mn(_.substrSec)}%.2f,"substr_first":${first.substrSec}%.2f,"docs_with_dup_spans":${first.docsCov},"covered_tokens":${first.tokCov},""" +
        f""""bp_sec":${mn(_.bpSec)}%.2f,"bp_first":${first.bpSec}%.2f,"docs_bp":${first.docsBp},"bp_covered_tokens":${first.tokBp},""" +
        f""""contain_sec":${mn(_.containSec)}%.2f,"contain_first":${first.containSec}%.2f,"n_contain":${first.nContain}}"""
    }

    val line =
      s"""{"metric":"scale_dedup","cells":${cells.mkString("[", ",", "]")},"planted_dup_share":0.1}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "SCALE_DEDUP_out.json")), line)
    spark.stop()
  }
}
