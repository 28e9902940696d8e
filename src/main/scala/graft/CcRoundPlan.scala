package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Side-by-side FORMATTED PLANS of the two candidate round-update shapes of
  * the [[graft.operators.DedupOps.nearDupClusters]] fixpoint loop, over the
  * same materialized (edges, labels) state — the plan evidence behind the
  * round-19 revert of the round-18 rewrite. The operator's cost is the
  * per-round plan; the query's final explain hides it behind the last
  * checkpoint's `Scan ExistingRDD`, so this probe rebuilds round 1 of each
  * shape explicitly:
  *
  *   - "r17 shape" (current code): nbrMin edge join + pointer-jump
  *     self-join, left-joined back onto the label table; one 3-way join,
  *     one aggregate.
  *   - "r18 shape" (reverted): 4-way tagged message union (neighbor msgs,
  *     squared jumps m2/m4, self) into one min-aggregate — whose m2 subtree
  *     is UNPERSISTED and referenced three times (once directly, twice
  *     inside m4), so the executed plan runs the label self-join three
  *     times plus the m4 join per round (the ADVICE.md r18 finding), and
  *     whose per-round wall time the round-18 driver bench measured growing
  *     ×4–5 per round until rc=124.
  *
  * Bench/plan-dump instrumentation only; never part of a gate plan.
  * Run: `sbt -batch "runMain graft.CcRoundPlan <sfDir>"`.
  */
object CcRoundPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // The same state every round of either shape starts from: the mirrored
    // persisted edge list of the kNN graph (the graph_components input) and
    // a checkpointed label table.
    val ee = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val pairs = graft.operators.VectorOps.knnGraph(
        ee, "vec_id", "embedding", 3, 4, 4, 64)
      .select(col("qid").as("a"), col("nid").as("b"))
    val fwd = pairs.persist()
    // localCheckpoint (vs the loop's persist) so the dumped plans show ONLY
    // the round's work: in the real loop the edge side is a materialized
    // cache scan per round, but `explain` on a persisted frame prints the
    // whole build lineage, which would bury the round shape under the kNN
    // graph plan. Execution shape per round is identical either way.
    val edges = fwd.unionAll(fwd.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    val labels = edges.groupBy("a")
      .agg(least(col("a"), min(col("b"))).as("lbl"))
      .select(col("a").as("id"), col("lbl"))
      .localCheckpoint()

    println("===== cc_round_r17_shape =====")
    val nbrMin = edges
      .join(labels.select(col("id").as("b"), col("lbl").as("nlbl")), "b")
      .groupBy("a").agg(min(col("nlbl")).as("nmin"))
    val jump = labels.select(col("id").as("lbl"), col("lbl").as("j2"))
    labels.join(nbrMin.select(col("a").as("id"), col("nmin")), Seq("id"), "left")
      .join(jump, Seq("lbl"), "left")
      .select(col("id"),
        least(col("lbl"),
          coalesce(col("nmin"), col("lbl")),
          coalesce(col("j2"), col("lbl"))).as("lbl"),
        col("lbl").as("old"))
      .explain("formatted")

    println("===== cc_round_r18_shape =====")
    val labelsByB = labels.select(col("id").as("b"), col("lbl").as("m"))
    val viaNbr = edges.join(labelsByB, "b")
      .select(col("a").as("id"), col("m"), lit(false).as("own"))
    val m2 = labels.select(col("lbl").as("b"), col("id"))
      .join(labelsByB, "b").select(col("id"), col("m"))
    val m4 = m2.select(col("m").as("b"), col("id"))
      .join(m2.select(col("id").as("b"), col("m")), "b")
      .select(col("id"), col("m"))
    val self = labels.select(col("id"), col("lbl").as("m"),
      lit(true).as("own"))
    viaNbr
      .unionAll(m2.select(col("id"), col("m"), lit(false).as("own")))
      .unionAll(m4.select(col("id"), col("m"), lit(false).as("own")))
      .unionAll(self)
      .groupBy("id")
      .agg(min(col("m")).as("lbl"),
        min(when(col("own"), col("m"))).as("old"))
      .explain("formatted")

    spark.stop()
  }
}
