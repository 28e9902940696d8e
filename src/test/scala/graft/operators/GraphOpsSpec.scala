package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class GraphOpsSpec extends AnyFunSuite {

  /** Reference integer PageRank: the exact recursion the operator claims
    * (floor division, damping 85/100, dangling mass dropped, node set =
    * distinct sources). */
  private def referencePr(edges: Seq[(Long, Long)], iters: Int,
                          scale: Long): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = deg.size.toLong
    val r0 = scale / n
    val base = (15L * r0) / 100L
    var r: Map[Long, Long] = deg.map { case (s, _) => s -> r0 }
    for (_ <- 1 to iters) {
      val contrib = edges
        .filter { case (s, d) => r.contains(s) && deg.contains(s) }
        .groupBy(_._2)
        .map { case (d, es) =>
          d -> es.map { case (s, _) => r(s) / deg(s) }.sum }
      r = deg.map { case (s, _) =>
        s -> (base + (85L * contrib.getOrElse(s, 0L)) / 100L) }
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = GraphOps.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.Caches.releaseAll()
    got
  }

  test("3-cycle: symmetric graph, equal ranks, mass preserved per node") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val got = run(edges, 4)
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got.values.toSet.size == 1, s"cycle ranks must be equal: $got")
    assert(got == referencePr(edges, 4, 1000000000000L))
  }

  test("star: the hub out-ranks the leaves and matches the reference") {
    // Leaves 2..5 all point at hub 1; hub points back at leaf 2 (so every
    // node is a source — the knnGraph-shaped symmetric-candidate property).
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 2L))
    val got = run(edges, 5)
    val ref = referencePr(edges, 5, 1000000000000L)
    assert(got == ref)
    assert(got(1L) > got(3L) && got(1L) > got(4L) && got(1L) > got(5L),
      s"hub must out-rank plain leaves: $got")
  }

  test("random graph matches the reference recursion exactly") {
    val rnd = new scala.util.Random(7)
    val n = 40
    val edges = (0 until n).flatMap { s =>
      // 1-3 out-edges per node, self-loops excluded.
      (0 until 1 + rnd.nextInt(3)).map { _ =>
        var d = rnd.nextInt(n)
        if (d == s) d = (s + 1) % n
        (s.toLong, d.toLong)
      }
    }.distinct
    assert(run(edges, 6) == referencePr(edges, 6, 1000000000000L))
  }

  test("ranks stay positive and bounded by the total mass") {
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L))
    val got = run(edges, 8)
    assert(got.values.forall(r => r > 0 && r <= 1000000000000L))
  }

  private def runTriangles(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val r = GraphOps.triangles(edges.toDF("src", "dst")).collect().head
    graft.core.Caches.releaseAll()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Brute-force census over the canonical undirected edge set. */
  private def refTriangles(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val ue = edges.map { case (s, d) => (math.min(s, d), math.max(s, d)) }
      .filter { case (a, b) => a < b }.toSet
    val vs = ue.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val tris = for {
      i <- vs.indices; j <- (i + 1) until vs.length; k <- (j + 1) until vs.length
      if ue((vs(i), vs(j))) && ue((vs(j), vs(k))) && ue((vs(i), vs(k)))
    } yield 1
    (vs.length.toLong, ue.size.toLong, tris.size.toLong)
  }

  test("triangles: directed/duplicate edges undirect once; counts match brute force") {
    // K4 on {1..4} given as a mix of directions + duplicates → 4 triangles.
    val k4 = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (3L, 2L), (2L, 4L), (4L, 3L), (3L, 4L))
    assert(runTriangles(k4) == (4L, 6L, 4L))
    // Chain + one closing edge → exactly 1 triangle, plus a pendant.
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    assert(runTriangles(chain) == (4L, 4L, 1L))
  }

  test("triangles: random graphs match brute force") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 5) {
      val n = 12 + trial
      val edges = (0 until 3 * n).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (s, d) => s != d }
      assert(runTriangles(edges) == refTriangles(edges), s"trial $trial")
    }
  }

  private def runTrianglesDeg(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val r = GraphOps.trianglesDegreeOrdered(edges.toDF("src", "dst")).collect().head
    graft.core.Caches.releaseAll()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("degree-ordered triangles equal the id-ordered census, including on a skewed hub") {
    // Hub 0 connected to everyone + a clique on {1,2,3,4} + random edges:
    // the worst case for id-ordering (hub centers most wedges) and the
    // exact case degree-ordering exists for.
    val hub = (1L to 20L).map(v => (0L, v))
    val clique = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val rnd = new scala.util.Random(3)
    val rand = (0 until 30).map(_ => (rnd.nextInt(21).toLong, rnd.nextInt(21).toLong))
      .filter { case (s, d) => s != d }
    val edges = hub ++ clique ++ rand
    assert(runTrianglesDeg(edges) == refTriangles(edges))
    assert(runTrianglesDeg(edges) == runTriangles(edges))
    // And on plain random graphs.
    for (trial <- 0 until 3) {
      val n = 10 + 2 * trial
      val es = (0 until 3 * n).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (s, d) => s != d }
      assert(runTrianglesDeg(es) == refTriangles(es), s"trial $trial")
    }
  }

  private def runKcore(edges: Seq[(Long, Long)], k: Int,
                       rounds: Int): Map[Long, Long] = {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val got = GraphOps.kCore(edges.toDF("src", "dst"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.Caches.releaseAll()
    got
  }

  /** Run-to-FIXPOINT brute-force peel (the k-core definition itself). */
  private def refKcore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var ue = edges.map { case (s, d) => (math.min(s, d), math.max(s, d)) }
      .filter { case (a, b) => a < b }.toSet
    var changed = true
    while (changed) {
      val deg = ue.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (v, vs) => v -> vs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = ue.filter { case (a, b) => keep(a) && keep(b) }
      changed = next != ue
      ue = next
    }
    ue.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
  }

  test("kCore: clique with pendant chain — the chain peels, the clique survives") {
    // K4 on {1..4} + chain 4-5-6: every chain vertex has degree ≤ 2, so a
    // 3-core peel removes 5 then 6 (two cascade rounds), keeping K4 intact.
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val edges = k4 ++ Seq((4L, 5L), (5L, 6L))
    val got = runKcore(edges, 3, 8)
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(got == refKcore(edges, 3))
  }

  test("kCore: fixed-round peel equals the run-to-fixpoint k-core on random graphs") {
    val rnd = new scala.util.Random(17)
    for (trial <- 0 until 5) {
      val n = 20 + 3 * trial
      val edges = (0 until 3 * n).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (s, d) => s != d }
      for (k <- Seq(2, 3, 4)) {
        // rounds = n is a trivially safe peel-depth bound (each
        // non-fixpoint round removes ≥ 1 vertex).
        assert(runKcore(edges, k, math.min(n, 64)) == refKcore(edges, k),
          s"trial $trial k $k")
      }
    }
  }

  test("kCore: a peel that empties the graph returns zero rows") {
    // A pure chain has no 2-core.
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(runKcore(chain, 3, 8).isEmpty)
    assert(refKcore(chain, 3).isEmpty)
  }

  private def runLpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val got = GraphOps.labelPropagation(edges.toDF("src", "dst"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.Caches.releaseAll()
    got
  }

  /** Sequential synchronous LPA reference: most-frequent neighbor label,
    * min-label tie-break, labels init = vertex id. */
  private def refLpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val ue = edges.map { case (s, d) => (math.min(s, d), math.max(s, d)) }
      .filter { case (a, b) => a < b }.toSet
    val nbrs = ue.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var labels = nbrs.keys.map(v => v -> v).toMap
    for (_ <- 0 until rounds) {
      labels = nbrs.map { case (v, ns) =>
        val votes = ns.map(labels).groupBy(identity)
          .map { case (l, ls) => (l, ls.size) }
        v -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  test("labelPropagation: two cliques joined by one edge stay SEPARATE communities") {
    // K3 {1,2,3} — K3 {4,5,6} with bridge 3-4: LPA settles into two
    // communities; CC (reachability) would merge everything into one.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val got = runLpa(edges, 4)
    assert(got == refLpa(edges, 4))
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(4L) == got(5L) && got(5L) == got(6L))
    assert(got(1L) != got(4L), "the bridge must not merge the cliques")
  }

  test("labelPropagation: fixed synchronous rounds match the sequential reference on random graphs") {
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 4) {
      val n = 12 + 3 * trial
      val edges = (0 until 3 * n).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (s, d) => s != d }
      for (rounds <- Seq(1, 3, 5)) {
        assert(runLpa(edges, rounds) == refLpa(edges, rounds),
          s"trial $trial rounds $rounds")
      }
    }
  }

  /** Reference personalized PageRank: the exact seeded recursion the
    * operator claims (node set = sources ∪ seeds, teleport to seeds only,
    * floor division, dangling mass dropped). */
  private def referencePpr(edges: Seq[(Long, Long)], seeds: Set[Long],
                           iters: Int, scale: Long): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = deg.keySet ++ seeds
    val r0 = scale / seeds.size
    val base = (15L * r0) / 100L
    var r: Map[Long, Long] =
      nodes.map(v => v -> (if (seeds(v)) r0 else 0L)).toMap
    for (_ <- 1 to iters) {
      val contrib = edges
        .filter { case (s, _) => deg.contains(s) }
        .groupBy(_._2)
        .map { case (d, es) =>
          d -> es.map { case (s, _) => r(s) / deg(s) }.sum }
      r = nodes.map { v =>
        v -> ((if (seeds(v)) base else 0L) +
          (85L * contrib.getOrElse(v, 0L)) / 100L)
      }.toMap
    }
    r
  }

  private def runPpr(edges: Seq[(Long, Long)], seeds: Seq[Long],
                     iters: Int): Map[Long, Long] = {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = GraphOps.personalizedPageRank(
        edges.toDF("src", "dst"), seeds.toDF("id"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.Caches.releaseAll()
    got
  }

  test("personalizedPageRank: mass stays near the seed; disconnected component ranks 0") {
    // Two 3-cycles; seed sits in the first — the second must stay at 0.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L))
    val got = runPpr(edges, Seq(1L), 4)
    assert(got == referencePpr(edges, Set(1L), 4, 1000000000000L))
    assert(got(10L) == 0L && got(11L) == 0L && got(12L) == 0L)
    // Every node in the seed's component is reached; the seed's direct
    // successor carries more propagated mass than the 2-step node.
    assert(got(1L) > 0L && got(2L) > got(3L) && got(3L) > 0L,
      s"seeded component must carry decaying positive mass: $got")
  }

  test("personalizedPageRank: seed without out-edges keeps base mass only") {
    // 7 is a seed nobody links to and with no out-edges: it must appear
    // in the node set holding exactly the base teleport term each round.
    val edges = Seq((1L, 2L), (2L, 1L))
    val got = runPpr(edges, Seq(1L, 7L), 3)
    val ref = referencePpr(edges, Set(1L, 7L), 3, 1000000000000L)
    assert(got == ref)
    assert(got(7L) == (15L * (1000000000000L / 2)) / 100L)
  }

  test("personalizedPageRank: random graphs match the reference recursion") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val n = 20 + 5 * trial
      val edges = (0 until n).flatMap { s =>
        (0 until 1 + rnd.nextInt(3)).map { _ =>
          var d = rnd.nextInt(n)
          if (d == s) d = (s + 1) % n
          (s.toLong, d.toLong)
        }
      }.distinct
      val seeds = (0 until 3).map(_ => rnd.nextInt(n).toLong).distinct
      assert(runPpr(edges, seeds, 5) ==
        referencePpr(edges, seeds.toSet, 5, 1000000000000L), s"trial $trial")
    }
  }
}
