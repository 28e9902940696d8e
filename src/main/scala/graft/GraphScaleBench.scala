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

    val cells = ns.map { n =>
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

      val t1 = System.nanoTime()
      val pr = graft.operators.GraphOps.pageRank(edges, 5)
      val prMass = pr.agg(sum("pr")).collect()(0).getLong(0)
      val prSec = (System.nanoTime() - t1) / 1e9
      graft.core.Caches.releaseAll()

      // Production round count: 50 iterations = 6 lazily-composed spans
      // re-rooted every ckptEvery = 8 rounds — the leg that proves the
      // r14 lazy-compose change holds when lineage bounding actually
      // matters, not just on the 5-round gate shape.
      val t1b = System.nanoTime()
      val pr50 = graft.operators.GraphOps.pageRank(edges, 50)
      val pr50Mass = pr50.agg(sum("pr")).collect()(0).getLong(0)
      val pr50Sec = (System.nanoTime() - t1b) / 1e9
      graft.core.Caches.releaseAll()

      val t2 = System.nanoTime()
      val nodes = spark.range(0, n).select(col("id").as("v"))
      val labels = graft.operators.DedupOps.nearDupClusters(
        nodes, "v", edges.select(col("src").as("id_a"), col("dst").as("id_b")))
      val nComponents = labels.select(countDistinct("cluster")).collect()(0).getLong(0)
      val ccSec = (System.nanoTime() - t2) / 1e9
      graft.core.Caches.releaseAll()

      val t3 = System.nanoTime()
      val core = graft.operators.GraphOps.kCore(edges, 4, 12)
      val nCore = core.count()
      val coreSec = (System.nanoTime() - t3) / 1e9
      graft.core.Caches.releaseAll()

      val t4 = System.nanoTime()
      val tri = graft.operators.GraphOps.trianglesDegreeOrdered(edges)
        .collect()(0)
      val triSec = (System.nanoTime() - t4) / 1e9
      graft.core.Caches.releaseAll()

      edges.unpersist(blocking = true)
      f"""{"n":$n,"n_edges":$nEdges,"gen_sec":$genSec%.2f,""" +
        f""""pagerank_sec":$prSec%.2f,"pr_mass":$prMass,""" +
        f""""pagerank50_sec":$pr50Sec%.2f,"pr50_mass":$pr50Mass,""" +
        f""""cc_sec":$ccSec%.2f,"n_components":$nComponents,""" +
        f""""kcore_sec":$coreSec%.2f,"n_core":$nCore,""" +
        f""""triangles_sec":$triSec%.2f,"n_triangles":${tri.getLong(2)}}"""
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
