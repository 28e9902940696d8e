package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale envelope for the graph-analytics family: PageRank, connected
  * components, k-core peel, and the degree-ordered triangle census over
  * synthetic similarity graphs at 1M and 10M nodes — the evidence that
  * the bounded-round iterative shapes (checkpoint-re-rooted joins, never
  * anything quadratic in nodes) hold at 10×.
  *
  * The graph is generated distributedly from `spark.range` arithmetic:
  * node i emits 1 + (xxhash64(i) % 5) directed edges to hash-derived
  * targets (expected ~3n edges, undirected degrees ~2–12 with real
  * variance — a constant-degree graph would make the k-core peel
  * all-or-nothing and measure the wrong regime; hash targets avoid the
  * modular aliasing a linear form would plant). WALL-CLOCK envelope
  * only — correctness of the same operators is oracle-gated at sf0.01
  * (`graph_pagerank`, `graph_components`, `graph_kcore`,
  * `graph_triangles`).
  *
  * Run: `sbt -batch "runMain graft.GraphScaleBench"` (env knobs:
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_SCALE_NS="1000000,10000000",
  * SPARK_GRAFT_SCALE_OUT=SCALE_GRAPH_out.json).
  */
object GraphScaleBench {

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

    // Bench.scala's first/min protocol for the big cells: the 10 M legs
    // swing 2–3× run-to-run on this box (page cache + GC phase — the
    // SCALING.md method note; r14's graph numbers read as regressions but
    // counts were identical), so each 10 M leg runs twice and the JSON
    // carries first AND min. 1 M legs stay single-run (their noise floor
    // is well under the round-over-round deltas that matter).
    def timedN[T](reps: Int)(body: => T): (T, Double, Double) = {
      var out: Option[T] = None
      var first = 0.0
      var best = Double.MaxValue
      for (i <- 0 until reps) {
        val t = System.nanoTime()
        val r = body // body must CONSUME (count/collect) its result
        val sec = (System.nanoTime() - t) / 1e9
        // Counts/masses must be identical across reps — the protocol's
        // whole point is that wall-clock varies and results don't
        // (DedupScaleBench/VectorScaleBench fail the same way).
        require(out.forall(_ == r), s"rep results diverged: $out vs $r")
        out = Some(r)
        if (i == 0) first = sec
        best = math.min(best, sec)
        graft.core.Caches.releaseAll()
      }
      (out.get, first, best)
    }

    val cells = ns.map { n =>
      val reps = if (n >= 10000000L) 2 else 1
      // Out-degree 1..5 per node (hash-varied), targets hash-derived;
      // self-loops bumped to the successor node.
      val edges = spark.range(0, n, 1, cpus.toInt * 4)
        .select(col("id").as("src"),
          explode(sequence(lit(0L),
            pmod(xxhash64(col("id")), lit(5L)))).as("j"))
        .select(col("src"),
          pmod(xxhash64(col("src"), col("j"), lit(7L)), lit(n)).as("dst"))
        .select(col("src"),
          when(col("dst") === col("src"),
            pmod(col("src") + 1L, lit(n))).otherwise(col("dst")).as("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t0 = System.nanoTime()
      val nEdges = edges.count()
      val genSec = (System.nanoTime() - t0) / 1e9

      val (prMass, prFirst, prSec) = timedN(reps) {
        graft.operators.GraphOps.pageRank(edges, 5)
          .agg(sum("pr")).collect()(0).getLong(0)
      }

      // Production round count: 50 iterations under the ckptEvery = 8
      // re-rooting AND the exact fixed-point early stop — the leg that
      // proves lineage bounding holds when it matters and measures what
      // the early exit buys (bit-identical pr50_mass either way).
      // rounds-executed is carried into the JSON (pr50_rounds) so the
      // wall-clock spread can be attributed: < 50 means the probe fired,
      // = 50 means the win is the final-round checkpoint + box variance.
      var pr50Rounds = -1
      val (pr50Mass, pr50First, pr50Sec) = timedN(reps) {
        val (pr, rounds) = graft.operators.GraphOps.pageRankCounted(edges, 50)
        pr50Rounds = rounds
        pr.agg(sum("pr")).collect()(0).getLong(0)
      }

      val (nComponents, ccFirst, ccSec) = timedN(reps) {
        val nodes = spark.range(0, n).select(col("id").as("v"))
        graft.operators.DedupOps.nearDupClusters(
            nodes, "v",
            edges.select(col("src").as("id_a"), col("dst").as("id_b")))
          .select(countDistinct("cluster")).collect()(0).getLong(0)
      }

      val (nCore, coreFirst, coreSec) = timedN(reps) {
        graft.operators.GraphOps.kCore(edges, 4, 12).count()
      }

      val (nTriangles, triFirst, triSec) = timedN(reps) {
        graft.operators.GraphOps.trianglesDegreeOrdered(edges)
          .collect()(0).getLong(2)
      }

      edges.unpersist(blocking = true)
      f"""{"n":$n,"n_edges":$nEdges,"gen_sec":$genSec%.2f,"reps":$reps,""" +
        f""""pagerank_sec":$prSec%.2f,"pagerank_first":$prFirst%.2f,"pr_mass":$prMass,""" +
        f""""pagerank50_sec":$pr50Sec%.2f,"pagerank50_first":$pr50First%.2f,"pr50_mass":$pr50Mass,""" +
        f""""pr50_rounds":$pr50Rounds,""" +
        f""""cc_sec":$ccSec%.2f,"cc_first":$ccFirst%.2f,"n_components":$nComponents,""" +
        f""""kcore_sec":$coreSec%.2f,"kcore_first":$coreFirst%.2f,"n_core":$nCore,""" +
        f""""triangles_sec":$triSec%.2f,"triangles_first":$triFirst%.2f,"n_triangles":$nTriangles}"""
    }

    val line =
      s"""{"metric":"scale_graph","cells":${cells.mkString("[", ",", "]")},"pr_iters":5,"kcore_k":4}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "SCALE_GRAPH_out.json")), line)
    spark.stop()
  }
}
