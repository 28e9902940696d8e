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

  /** Replay of [[graft.operators.VectorOps.bucketCol]] for table `t`. */
  private def bucketOf(t: Int, bits: Int, v: Array[Float]): Int =
    (0 until bits).map { bit =>
      val p = graft.operators.VectorOps.plane(t, bit, bits, dims)
      val d = v.zip(p).map { case (x, w) => x.toDouble * w }.sum
      if (d >= 0) 1 << bit else 0
    }.sum

  private def cosF(x: Array[Float], y: Array[Float]): Double = {
    val d = x.zip(y).map { case (p, q) => p.toDouble * q }.sum
    d / (math.sqrt(x.map(v => v.toDouble * v).sum) *
      math.sqrt(y.map(v => v.toDouble * v).sum))
  }

  /** Deterministic search for a near-dup pair that table 0 SEPARATES and
    * table 1 CO-BUCKETS at `bits` bits with cosine ≥ `minCos`: rotate a
    * seeded base toward a seeded companion until the bucket pattern
    * appears. The fixture every multi-table assertion rides on. */
  private def plantTable2Pair(bits: Int, minCos: Double)
      : (Array[Float], Array[Float]) = {
    val rnd = new scala.util.Random(11)
    val found = Iterator.continually {
      val x = Array.fill(dims)(rnd.nextFloat() * 2 - 1)
      val o = Array.fill(dims)(rnd.nextFloat() * 2 - 1)
      (1 to 40).iterator.map { s =>
        val theta = s * 0.02
        val y = x.zip(o).map { case (a, b) =>
          (a * math.cos(theta) + b * math.sin(theta)).toFloat }
        (x, y)
      }.find { case (a, b) =>
        cosF(a, b) >= minCos &&
          bucketOf(0, bits, a) != bucketOf(0, bits, b) &&
          bucketOf(1, bits, a) == bucketOf(1, bits, b)
      }
    }.take(200).flatten.toSeq.headOption
    assert(found.nonEmpty, "fixture search must plant a table-2-only pair")
    found.get
  }

  test("multi-table votes: a pair only table 2 co-buckets is missed single-table, caught by the table-1 vote, OR'd by orVotes") {
    val spark = TestSpark.spark
    import spark.implicits._
    val bits = 4
    val minCos = 0.7
    val (x, y) = plantTable2Pair(bits, minCos)
    val df = Seq((1L, ts(600), x), (2L, ts(601), y))
      .toDF("vec_id", "ts", "embedding")
    // Single-table (= table 0) misses the pair: buckets differ.
    val single = StreamEmbDedup.flagNearDups(
        df, "vec_id", "ts", "embedding", bits, dims, minCos, cap = 8,
        "10 minutes")
      .collect().map(f => f.vec_id -> f.dup).toMap
    assert(single(2L) == false, "table 0 must miss the planted pair")
    // Two-table votes: table 0 misses, table 1 catches.
    val votes = StreamEmbDedup.flagNearDupVotes(
        df, "vec_id", "ts", "embedding", 2, bits, dims, minCos, cap = 8,
        "10 minutes")
      .collect().map(v => (v.vec_id, v.table) -> v.dup).toMap
    assert(votes((2L, 0)) == false, "table 0 vote must stay false")
    assert(votes((2L, 1)) == true, "table 1 vote must catch the pair")
    assert(votes((1L, 0)) == false && votes((1L, 1)) == false,
      "the seed passes in both tables")
    // The OR consolidation (batch frame: plain aggregation).
    val ord = StreamEmbDedup.orVotes(
        StreamEmbDedup.flagNearDupVotes(
          df, "vec_id", "ts", "embedding", 2, bits, dims, minCos, cap = 8,
          "10 minutes"),
        "10 minutes")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(ord == Map(1L -> false, 2L -> true),
      s"orVotes must flag exactly the union: $ord")
  }

  test("streaming votes -> orVotes chain emits consolidated flags once the watermark passes") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bits = 4
    val minCos = 0.7
    val (x, y) = plantTable2Pair(bits, minCos)
    val stream = MemoryStream[(Long, java.sql.Timestamp, Array[Float])]
    val out = StreamEmbDedup.flagNearDupsOr(
      stream.toDF.toDF("vec_id", "ts", "embedding"), "vec_id", "ts",
      "embedding", 2, bits, dims, minCos, cap = 8, "10 minutes")
    // The chain is safe by construction (votes carry their arrival's own
    // event time — see orVotes' scaladoc); Spark's conservative global-
    // watermark check cannot prove that — allowVotesChain scopes the
    // waiver to this one .start() and must restore the guard after.
    val checkKey = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prevCheck = spark.conf.getOption(checkKey)
    val q = StreamEmbDedup.allowVotesChain(spark) {
      out.writeStream.format("memory").queryName("emb_votes_or")
        .outputMode("append").start()
    }
    assert(spark.conf.getOption(checkKey) === prevCheck,
      "allowVotesChain must restore the correctness-check conf")
    try {
      stream.addData((1L, ts(600), x), (2L, ts(601), y))
      q.processAllAvailable()
      // Consolidated rows emit only after the watermark passes their ts:
      // push it with a late sentinel arrival.
      stream.addData((9L, ts(700), Array.fill(dims)(1.0f)))
      q.processAllAvailable()
      val got = spark.table("emb_votes_or").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(got.get(1L).contains(false), s"seed must consolidate false: $got")
      assert(got.get(2L).contains(true),
        s"table-2-only near-dup must consolidate true: $got")
    } finally q.stop()
  }

  test("orVotes rejects a downstream lateness shorter than the votes'") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, ts(600), Array.fill(dims)(1.0f)))
      .toDF("vec_id", "ts", "embedding")
    val votes = StreamEmbDedup.flagNearDupVotes(
      df, "vec_id", "ts", "embedding", 2, 4, dims, 0.7, cap = 8,
      "10 minutes")
    val e = intercept[IllegalArgumentException] {
      StreamEmbDedup.orVotes(votes, "5 minutes", Some("10 minutes"))
    }
    assert(e.getMessage.contains("lateness"))
    // Equal and longer both pass (cross-unit comparison included).
    StreamEmbDedup.orVotes(votes, "10 minutes", Some("10 minutes"))
    StreamEmbDedup.orVotes(votes, "1 hour", Some("599 seconds"))
  }

  test("saturation counter fires once per rejected admission") {
    val spark = TestSpark.spark
    import spark.implicits._
    // The saturated-bucket fixture of the first test: cap = 1, vec 2 is a
    // valid unflagged arrival whose bucket is already full -> exactly one
    // rejected admission (vec 3 is a near-copy of vec 2 — flagged? no:
    // vec 2 was never admitted, so vec 3 is ALSO unflagged and ALSO
    // rejected -> counter 2).
    val p = graft.operators.VectorOps.plane(0, 0, 1, dims)
    def dotP(v: Array[Float]): Double =
      v.zip(p).map { case (a, w) => a.toDouble * w }.sum
    val v1 = Array.fill(dims)(1.0f)
    val v2base = Array(1f, -1f, 1f, -1f, 1f, -1f, 1f, -1f)
    val v2 = v2base.map(a => if (dotP(v2base) * dotP(v1) < 0) -a else a)
    assert(dotP(v1) * dotP(v2) > 0, "fixture must share the bucket")
    val df = Seq(
      (1L, ts(600), v1), (2L, ts(601), v2), (3L, ts(602), near(v2, 1f)))
      .toDF("vec_id", "ts", "embedding")
    val sat = spark.sparkContext.longAccumulator("emb_dedup_saturated")
    StreamEmbDedup.flagNearDups(
        df, "vec_id", "ts", "embedding", 1, dims, 0.95, cap = 1,
        "10 minutes", saturated = Some(sat))
      .collect()
    assert(sat.value == 2L,
      s"two valid unflagged arrivals hit the full bucket: ${sat.value}")
    // Control: with cap = 3 nothing is rejected.
    val sat2 = spark.sparkContext.longAccumulator("emb_dedup_saturated2")
    StreamEmbDedup.flagNearDups(
        df, "vec_id", "ts", "embedding", 1, dims, 0.95, cap = 3,
        "10 minutes", saturated = Some(sat2))
      .collect()
    assert(sat2.value == 0L, s"no rejection with room: ${sat2.value}")
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
