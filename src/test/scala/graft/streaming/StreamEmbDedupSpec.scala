package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.TestSpark

/** Streaming semantics of [[StreamEmbDedup.flagNearDups]]: the first
  * member of a semantic cluster passes unflagged and seeds the keep-set;
  * later near-copies — across batches and within one batch — flag dup;
  * distinct vectors pass; the per-bucket representative cap is honored;
  * and a degenerate vector passes through unflagged. */
class StreamEmbDedupSpec extends AnyFunSuite {

  private def ts(minOfDay: Int): java.sql.Timestamp =
    new java.sql.Timestamp(minOfDay * 60000L)

  private val dims = 8

  /** A unit-ish base vector plus a small deterministic wiggle: stays
    * within cosine ≥ 0.999 of the base — same LSH bucket, clearly a
    * near-dup at the 0.95 threshold. */
  private def near(base: Array[Float], eps: Float): Array[Float] =
    base.zipWithIndex.map { case (x, i) => x + eps * (if (i % 2 == 0) 1 else -1) * 0.01f }

  test("saturated bucket admits no representative: later near-copies of the unadmitted vector pass") {
    val spark = TestSpark.spark
    import spark.implicits._
    // bits = 1 → two buckets (sign of one plane dot). Pick two DISTINCT
    // vectors sharing the positive bucket: the first fills cap = 1; the
    // second passes (distinct) but is NOT admitted; a near-copy of the
    // second must then ALSO pass — the documented saturation trade.
    val p = graft.operators.VectorOps.plane(0, 0, 1, dims)
    def dotP(v: Array[Float]): Double =
      v.zip(p).map { case (x, w) => x.toDouble * w }.sum
    val v1 = Array.fill(dims)(1.0f)
    val v2 = Array(1f, -1f, 1f, -1f, 1f, -1f, 1f, -1f)
      .map(x => if (dotP(Array(1f, -1f, 1f, -1f, 1f, -1f, 1f, -1f)) *
        dotP(v1) < 0) -x else x)
    assert(dotP(v1) * dotP(v2) > 0, "fixture must share the bucket")
    val df = Seq(
      (1L, ts(600), v1), (2L, ts(601), v2), (3L, ts(602), near(v2, 1f)))
      .toDF("vec_id", "ts", "embedding")
    val got = StreamEmbDedup.flagNearDups(
        df, "vec_id", "ts", "embedding", 1, dims, 0.95, cap = 1, "10 minutes")
      .collect().map(f => f.vec_id -> f.dup).toMap
    assert(got(1L) == false && got(2L) == false,
      "distinct vectors must pass regardless of saturation")
    assert(got(3L) == false,
      "a near-copy of an UNADMITTED vector must pass (saturation trade)")
    // Control: with cap = 2 the same near-copy flags.
    val got2 = StreamEmbDedup.flagNearDups(
        df, "vec_id", "ts", "embedding", 1, dims, 0.95, cap = 2, "10 minutes")
      .collect().map(f => f.vec_id -> f.dup).toMap
    assert(got2(3L) == true, "with room in the keep-set the copy flags")
  }

  test("first-kept semantics: near-copies flag across and within batches; distincts pass") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val a = Array.fill(dims)(1.0f)
    val b = Array(1f, -1f, 1f, -1f, 1f, -1f, 1f, -1f) // orthogonal to a
    val stream = MemoryStream[(Long, java.sql.Timestamp, Array[Float])]
    val out = StreamEmbDedup.flagNearDups(
      stream.toDF.toDF("vec_id", "ts", "embedding"), "vec_id", "ts",
      "embedding", 4, dims, 0.95, cap = 2, "10 minutes")
    val q = out.toDF.writeStream.format("memory").queryName("emb_stream")
      .outputMode("append").start()
    try {
      // Batch 1: vec 1 seeds cluster A; vec 2 is a within-batch near-copy
      // (arrives later by id at the same ts — flagged); vec 3 is distinct
      // (cluster B seed).
      stream.addData(
        (1L, ts(600), a), (2L, ts(600), near(a, 1f)), (3L, ts(600), b))
      q.processAllAvailable()
      // Batch 2: vec 4 = cross-batch near-copy of A; vec 5 near-copy of B;
      // vec 6 a degenerate (wrong-dims) vector — passes unflagged.
      stream.addData(
        (4L, ts(605), near(a, 2f)), (5L, ts(605), near(b, 1f)),
        (6L, ts(605), Array(1.0f)))
      q.processAllAvailable()
      val got = spark.table("emb_stream").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(got(1L) == false, "cluster seed must pass")
      assert(got(2L) == true, "within-batch near-copy must flag")
      assert(got(3L) == false, "distinct vector must pass")
      assert(got(4L) == true, "cross-batch near-copy must flag")
      assert(got(5L) == true, "near-copy of the second representative must flag")
      assert(got(6L) == false, "degenerate vector must pass through unflagged")
    } finally q.stop()
  }

  test("batch-frame parity: greedy first-occurrence scan per bucket") {
    // The operator runs on a plain batch frame with empty initial state —
    // the contract every twin here keeps. Replay the same greedy rule in
    // Scala and compare every flag.
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val base = Array.fill(3)(Array.fill(dims)(rnd.nextFloat() * 2 - 1))
    val rows = (0 until 60).map { i =>
      val v =
        if (i % 4 == 3) Array.fill(dims)(rnd.nextFloat() * 2 - 1) // noise
        else near(base(i % 3), (i / 3).toFloat)
      (i.toLong, ts(600 + i / 10), v)
    }
    val df = rows.toDF("vec_id", "ts", "embedding")
    val got = StreamEmbDedup.flagNearDups(
        df, "vec_id", "ts", "embedding", 4, dims, 0.95, cap = 64, "10 minutes")
      .collect().map(f => f.vec_id -> f.dup).toMap
    // Scala replay: bucket via the same planes, greedy keep-first.
    def bucketOf(v: Array[Float]): Int =
      (0 until 4).map { bit =>
        val p = graft.operators.VectorOps.plane(0, bit, 4, dims)
        val d = v.zip(p).map { case (x, w) => x.toDouble * w }.sum
        if (d >= 0) 1 << bit else 0
      }.sum
    def cos(x: Array[Float], y: Array[Float]): Double = {
      val xd = x.map(_.toDouble); val yd = y.map(_.toDouble)
      val d = xd.zip(yd).map { case (p, q) => p * q }.sum
      d / (math.sqrt(xd.map(v => v * v).sum) * math.sqrt(yd.map(v => v * v).sum))
    }
    val kept = scala.collection.mutable.Map.empty[Int, List[Array[Float]]]
    val exp = rows.sortBy(r => (r._2.getTime, r._1)).map { case (id, _, v) =>
      val bkt = bucketOf(v)
      val ks = kept.getOrElse(bkt, Nil)
      val dup = ks.exists(k => cos(k, v) >= 0.95)
      if (!dup) kept(bkt) = v :: ks
      id -> dup
    }.toMap
    assert(got == exp, "stream flags must equal the greedy batch replay")
  }
}
