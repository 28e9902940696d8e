package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class VectorOpsSpec extends AnyFunSuite {

  test("cosine matches hand-computed values") {
    val spark = TestSpark.spark
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 2.0f)),   // orthogonal
      (Array(1.0f, 1.0f), Array(2.0f, 2.0f)),   // parallel
      (Array(3.0f, 4.0f), Array(4.0f, 3.0f))
    ).toDF("a", "b")
    val got = df.select(VectorOps.cosine(
        VectorOps.asDouble(col("a")), VectorOps.asDouble(col("b"))))
      .collect().map(_.getDouble(0))
    assert(math.abs(got(0)) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) - 24.0 / 25.0) < 1e-12)
  }

  test("assertNoNullComponents: clean vectors pass through unchanged, a null component fails loudly, null rows pass") {
    val spark = TestSpark.spark
    import spark.implicits._
    val clean = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val got = VectorOps.assertNoNullComponents(clean, "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    assert(got == Map(1L -> Seq(1.0f, 2.0f), 2L -> Seq(3.0f, 4.0f)))
    // A null COMPONENT (the graft_dot reads-as-0 case) must throw.
    val dirty = Seq((1L, Array[java.lang.Float](1.0f, null)),
      (2L, Array[java.lang.Float](3.0f, 4.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      VectorOps.assertNoNullComponents(dirty, "embedding").collect()
    }
    assert(e.getMessage.contains("null component"),
      s"wrong failure: ${e.getMessage}")
    // A null ROW passes (whole-null vectors are every operator's own
    // documented case).
    val nullRow = Seq((1L, Array(1.0f, 2.0f)), (2L, null))
      .toDF("vec_id", "embedding")
    assert(VectorOps.assertNoNullComponents(nullRow, "embedding")
      .count() == 2L)
  }

  test("graft_dot is null on mismatched array lengths, not a truncated sum") {
    val spark = TestSpark.spark
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(1.0, 1.0, 1.0)), // equal dims -> 6.0
      (Array(1.0, 2.0, 3.0), Array(1.0, 1.0))       // drifted dims -> null
    ).toDF("a", "b")
    val got = df.select(VectorOps.dot(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 6.0)
    assert(got(1).isNullAt(0), "length mismatch must surface as null")
  }

  test("planeText parses to exactly planeValue") {
    (0 until 2048).foreach { j =>
      assert(VectorOps.planeText(j).toDouble == VectorOps.planeValue(j),
        s"plane literal mismatch at $j")
    }
  }

  test("quantizeInt8: extremes hit ±127, zero vector quantizes to zeros with scale 0") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      (0L, Array(2.0f, -2.0f, 1.0f, 0.0f)),
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = VectorOps.quantizeInt8(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Long](2))).toMap
    assert(got(0L)._1 == 2.0 / 127.0)
    assert(got(0L)._2 == Seq(127L, -127L, 64L, 0L)) // 1.0/scale = 63.5 -> floor(64.0)
    assert(got(1L)._1 == 0.0 && got(1L)._2 == Seq(0L, 0L, 0L, 0L))
  }

  test("knnIvf: probing all cells equals brute force; one probe stays in-cluster") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Two tight clusters around the axes; centroids 10 (x-axis) and 20
    // (y-axis); query 0 sits in the x cluster.
    val df = Seq(
      (0L,  Array(1.0f, 0.05f)),
      (10L, Array(1.0f, 0.0f)),  (11L, Array(0.95f, 0.1f)),
      (12L, Array(0.9f, 0.15f)),
      (20L, Array(0.0f, 1.0f)),  (21L, Array(0.1f, 0.95f)),
      (22L, Array(0.15f, 0.9f))
    ).toDF("vec_id", "embedding")
    val cent = col("vec_id") === 10 || col("vec_id") === 20
    val all = VectorOps.knnIvf(df, "vec_id", "embedding", col("vec_id") === 0,
        6, cent, probes = 2)
      .orderBy("rnk").collect().map(_.getLong(1)).toSeq
    val brute = VectorOps.knnBrute(df, "vec_id", "embedding", col("vec_id") === 0, 6)
      .orderBy("rnk").collect().map(_.getLong(1)).toSeq
    assert(all == brute, s"full-probe IVF $all != brute $brute")
    val one = VectorOps.knnIvf(df, "vec_id", "embedding", col("vec_id") === 0,
        6, cent, probes = 1)
      .collect().map(_.getLong(1)).toSet
    assert(one == Set(10L, 11L, 12L), s"one-probe IVF should stay in the x cell: $one")
  }

  test("kmeansAssign matches an in-memory Lloyd reference and separates clear clusters") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // Three well-separated blobs in 4D; centroid seeds one per blob (ids
    // 0, 10, 20) plus noise members.
    def blob(center: Array[Float], n: Int, from: Long) =
      (0 until n).map(i => (from + i,
        center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f)))
    val rows = blob(Array(1f, 0f, 0f, 0f), 7, 0L) ++
      blob(Array(0f, 1f, 0f, 0f), 7, 10L) ++
      blob(Array(0f, 0f, 1f, 0f), 7, 20L)
    val df = rows.toDF("vec_id", "embedding")
    val got = graft.core.Caches.scoped {
      VectorOps.kmeansAssign(df, "vec_id", "embedding",
          col("vec_id") === 0 || col("vec_id") === 10 || col("vec_id") === 20, 3, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    // Reference: same integer Lloyd rules on the driver.
    val quant = rows.map { case (id, v) =>
      val scale = v.map(x => math.abs(x.toDouble)).max / 127.0
      id -> (if (scale > 0) v.map(x => math.floor(x / scale + 0.5).toLong)
             else v.map(_ => 0L))
    }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var cents: Seq[(Long, Array[Long])] =
      Seq(0L, 10L, 20L).map(id => id -> quant(id))
    def assign(): Map[Long, (Long, Long)] = quant.map { case (id, v) =>
      val (dist, cid) = cents.map { case (cid, cv) => (d2(v, cv), cid) }.min
      id -> ((cid, dist))
    }
    for (_ <- 1 to 3) {
      val byCell = assign().toSeq.groupBy(_._2._1)
      cents = cents.map { case (cid, cv) =>
        byCell.get(cid) match {
          case Some(members) =>
            val vs = members.map(m => quant(m._1))
            val n = vs.size.toLong
            cid -> Array.tabulate(4) { i =>
              val s = vs.map(_(i)).sum
              val a = (2L * math.abs(s) + n) / (2L * n)
              if (s < 0) -a else a
            }
          case None => cid -> cv
        }
      }
    }
    val expected = assign().map { case (id, (cid, dist)) => (id, cid, dist) }.toSet
    assert(got.toSet == expected)
    // And the blobs actually separate: members cluster with their seed.
    got.foreach { case (id, cid, _) => assert(cid == (id / 10) * 10, s"$id -> $cid") }
  }

  test("kmeansFarthestFirst matches an in-memory maximin + Lloyd reference") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    def blob(center: Array[Float], n: Int, from: Long) =
      (0 until n).map(i => (from + i,
        center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f)))
    val rows = blob(Array(1f, 0f, 0f, 0f), 6, 0L) ++
      blob(Array(0f, 1f, 0f, 0f), 6, 10L) ++
      blob(Array(0f, 0f, 1f, 0f), 6, 20L)
    val df = rows.toDF("vec_id", "embedding")
    val got = graft.core.Caches.scoped {
      VectorOps.kmeansFarthestFirst(df, "vec_id", "embedding", 3, 3, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    // In-memory reference: identical quantization, maximin seeding, Lloyd.
    val quant = rows.map { case (id, v) =>
      val scale = v.map(x => math.abs(x.toDouble)).max / 127.0
      id -> (if (scale > 0) v.map(x => math.floor(x / scale + 0.5).toLong)
             else v.map(_ => 0L))
    }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var seeds = Seq(0L)
    while (seeds.length < 3) {
      val next = quant.toSeq
        .map { case (id, v) => (seeds.map(s => d2(v, quant(s))).min, id) }
        .sortBy { case (md, id) => (-md, id) }.head._2
      seeds = seeds :+ next
    }
    var cents: Seq[(Long, Array[Long])] = seeds.map(s => s -> quant(s))
    def assign(): Map[Long, (Long, Long)] = quant.map { case (id, v) =>
      val (dist, cid) = cents.map { case (cid, cv) => (d2(v, cv), cid) }.min
      id -> ((cid, dist))
    }
    for (_ <- 1 to 3) {
      val byCell = assign().toSeq.groupBy(_._2._1)
      cents = cents.map { case (cid, cv) =>
        byCell.get(cid) match {
          case Some(members) =>
            val vs = members.map(m => quant(m._1)); val n = vs.size.toLong
            cid -> Array.tabulate(4) { i =>
              val s = vs.map(_(i)).sum
              val a = (2L * math.abs(s) + n) / (2L * n)
              if (s < 0) -a else a
            }
          case None => cid -> cv
        }
      }
    }
    val expected = assign().map { case (id, (cid, dist)) => (id, cid, dist) }.toSet
    assert(got == expected, s"got $got\nexpected $expected")
    // Maximin from id 0 (blob x) must have seeded one vector per blob.
    assert(seeds.map(_ / 10).toSet == Set(0L, 1L, 2L), s"seeds $seeds")
  }

  test("knnIvfKmeans: probing all trained cells equals brute force; one probe stays in-cluster") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    def blob(center: Array[Float], n: Int, from: Long) =
      (0 until n).map(i => (from + i,
        center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f)))
    val rows = blob(Array(1f, 0f, 0f, 0f), 7, 0L) ++
      blob(Array(0f, 1f, 0f, 0f), 7, 10L) ++
      blob(Array(0f, 0f, 1f, 0f), 7, 20L)
    val df = rows.toDF("vec_id", "embedding")
    val seeds = col("vec_id") === 0 || col("vec_id") === 10 || col("vec_id") === 20
    val queries = col("vec_id") === 1 || col("vec_id") === 11
    // All 3 cells probed -> candidate set is the whole corpus -> must equal
    // exact brute force.
    val all = graft.core.Caches.scoped {
      VectorOps.knnIvfKmeans(df, "vec_id", "embedding", queries, 4, seeds,
          iters = 3, probes = 3, dims = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val brute = VectorOps.knnBrute(df, "vec_id", "embedding", queries, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(all == brute, s"all-probe != brute: $all vs $brute")
    // One probe: every neighbor comes from the query's own blob.
    val one = graft.core.Caches.scoped {
      VectorOps.knnIvfKmeans(df, "vec_id", "embedding", queries, 4, seeds,
          iters = 3, probes = 1, dims = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(one.nonEmpty)
    one.foreach { case (q, n) => assert(n / 10 == q / 10, s"$q paired out-of-blob $n") }
  }

  test("ivfModelSampled: sampleMod=1 is the full-scan model; sampled training keeps assignment parity on the fixture") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    def blob(center: Array[Float], n: Int, from: Long) =
      (0 until n).map(i => (from + i,
        center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f)))
    val rows = blob(Array(1f, 0f, 0f, 0f), 7, 0L) ++
      blob(Array(0f, 1f, 0f, 0f), 7, 10L) ++
      blob(Array(0f, 0f, 1f, 0f), 7, 20L)
    val df = rows.toDF("vec_id", "embedding")
    val seeds = col("vec_id") === 0 || col("vec_id") === 10 || col("vec_id") === 20
    val queries = col("vec_id") === 1 || col("vec_id") === 11
    // sampleMod = 1: the sampled API IS the full-scan build, bit-for-bit.
    val full = graft.core.Caches.scoped {
      VectorOps.knnIvfKmeans(df, "vec_id", "embedding", queries, 4, seeds,
          iters = 2, probes = 2, dims = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val mod1 = graft.core.Caches.scoped {
      VectorOps.knnIvfKmeansSampled(df, "vec_id", "embedding", queries, 4,
          seeds, iters = 2, probes = 2, dims = 4, sampleMod = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(mod1 == full, s"sampleMod=1 must equal the full build: $mod1 vs $full")
    // sampleMod = 2: Lloyd sees ~half of each blob, but blob separation
    // dwarfs intra-blob variance, so the FULL-corpus assignment must keep
    // the blob structure — all-probe equals brute, one-probe stays in-blob.
    val brute = VectorOps.knnBrute(df, "vec_id", "embedding", queries, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val allProbe = graft.core.Caches.scoped {
      VectorOps.knnIvfKmeansSampled(df, "vec_id", "embedding", queries, 4,
          seeds, iters = 2, probes = 3, dims = 4, sampleMod = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(allProbe == brute, s"sampled all-probe != brute: $allProbe vs $brute")
    val oneProbe = graft.core.Caches.scoped {
      VectorOps.knnIvfKmeansSampled(df, "vec_id", "embedding", queries, 4,
          seeds, iters = 2, probes = 1, dims = 4, sampleMod = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(oneProbe.nonEmpty)
    oneProbe.foreach { case (q, n) =>
      assert(n / 10 == q / 10, s"$q paired out-of-blob $n under sampled training")
    }
  }

  test("knnIvfPqSampled: sampleMod=1 is the full IVF+PQ build; sampled books keep in-blob structure") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def blob(center: Array[Float], n: Int, from: Long) =
      (0 until n).map(i => (from + i,
        center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f)))
    val rows = blob(Array(1f, 0f, 0f, 0f), 7, 0L) ++
      blob(Array(0f, 1f, 0f, 0f), 7, 10L) ++
      blob(Array(0f, 0f, 1f, 0f), 7, 20L)
    val df = rows.toDF("vec_id", "embedding")
    val seeds = col("vec_id") === 0 || col("vec_id") === 10 || col("vec_id") === 20
    val queries = col("vec_id") === 1 || col("vec_id") === 11
    val full = graft.core.Caches.scoped {
      VectorOps.knnIvfPq(df, "vec_id", "embedding", queries, 4, seeds,
          coarseIters = 2, probes = 2, pqIters = 2, m = 2, dims = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val mod1 = graft.core.Caches.scoped {
      VectorOps.knnIvfPqSampled(df, "vec_id", "embedding", queries, 4, seeds,
          coarseIters = 2, probes = 2, pqIters = 2, m = 2, dims = 4,
          sampleMod = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(mod1 == full, s"sampleMod=1 must equal the full build: $mod1 vs $full")
    // Sampled books (mod 2): one-probe neighbors stay in the query's blob
    // — the coarse structure survives training on the half-sample, and
    // ADC over half-trained books still separates blobs (inter-blob
    // distance dwarfs quantization error on this fixture).
    val oneProbe = graft.core.Caches.scoped {
      VectorOps.knnIvfPqSampled(df, "vec_id", "embedding", queries, 4, seeds,
          coarseIters = 2, probes = 1, pqIters = 2, m = 2, dims = 4,
          sampleMod = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(oneProbe.nonEmpty)
    oneProbe.foreach { case (q, n) =>
      assert(n / 10 == q / 10, s"$q paired out-of-blob $n under sampled books")
    }
    // Residual sampled books: sampleMod=1 equals the full residual model.
    val resFull = graft.core.Caches.scoped {
      VectorOps.knnIvfPqResidual(df, "vec_id", "embedding", queries, 4,
          seeds, coarseIters = 2, probes = 2, pqIters = 2, m = 2, dims = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val resMod1 = graft.core.Caches.scoped {
      val ivf = VectorOps.ivfModel(df, "vec_id", "embedding", seeds, 2, 4)
      val pm = VectorOps.ivfPqResidualModelSampled(ivf, 2, 2, sampleMod = 1)
      VectorOps.knnIvfPqResidualFrom(pm, df, "vec_id", queries, 4, probes = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(resMod1 == resFull,
      s"residual sampleMod=1 must equal the full build: $resMod1 vs $resFull")
    // mod 2: the sampled residual books must ACTUALLY train on the
    // sample — on this fixed-seed noise fixture the half-sample centroid
    // means differ from the full-scan ones, so identical books mean the
    // sampleMod was dropped on the floor (the r15 review finding); and
    // one-probe search must keep blob structure under the sampled books.
    graft.core.Caches.scoped {
      val ivf = VectorOps.ivfModel(df, "vec_id", "embedding", seeds, 2, 4)
      val pmFull = VectorOps.ivfPqResidualModel(ivf, 2, 2)
      val pmSamp = VectorOps.ivfPqResidualModelSampled(ivf, 2, 2, sampleMod = 2)
      assert(pmSamp.books.flatten.map(_._2.toSeq) !=
          pmFull.books.flatten.map(_._2.toSeq),
        "sampled residual books must differ from full-scan books " +
          "(sampleMod dropped?)")
      val resOneProbe = VectorOps
        .knnIvfPqResidualFrom(pmSamp, df, "vec_id", queries, 4, probes = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(resOneProbe.nonEmpty)
      resOneProbe.foreach { case (q, n) =>
        assert(n / 10 == q / 10,
          s"$q paired out-of-blob $n under sampled residual books")
      }
    }
  }

  test("kmeansFarthestFirstSampled: sampleMod=1 is the full operator; sampled seeding still covers the blobs") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(33)
    def blob(center: Array[Float], n: Int, from: Long) =
      (0 until n).map(i => (from + i,
        center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f)))
    val rows = blob(Array(1f, 0f, 0f, 0f), 8, 0L) ++
      blob(Array(0f, 1f, 0f, 0f), 8, 10L) ++
      blob(Array(0f, 0f, 1f, 0f), 8, 20L)
    val df = rows.toDF("vec_id", "embedding")
    val full = graft.core.Caches.scoped {
      VectorOps.kmeansFarthestFirst(df, "vec_id", "embedding", 3, 2, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val mod1 = graft.core.Caches.scoped {
      VectorOps.kmeansFarthestFirstSampled(df, "vec_id", "embedding", 3, 2, 4,
          sampleMod = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(mod1 == full, s"sampleMod=1 must equal the full run: $mod1 vs $full")
    // sampleMod=2: seeds come from the sample, but maximin over ~half of
    // each well-separated blob still lands one seed per blob, so the
    // FULL-corpus assignment keeps every vector with its own blob's cell.
    val sampled = graft.core.Caches.scoped {
      VectorOps.kmeansFarthestFirstSampled(df, "vec_id", "embedding", 3, 2, 4,
          sampleMod = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(sampled.map(_._1).toSet == rows.map(_._1).toSet,
      "every corpus vector must be assigned")
    val cellsPerBlob = sampled.groupBy(_._1 / 10)
      .map { case (b, xs) => b -> xs.map(_._2).toSet }
    cellsPerBlob.foreach { case (b, cs) =>
      assert(cs.size == 1, s"blob $b split across cells $cs under sampling")
    }
    assert(cellsPerBlob.values.toSet.size == 3,
      s"three blobs must map to three distinct cells: $cellsPerBlob")
  }

  test("knnGraph equals knnLsh on a query subset; planted duplicate ranks first both ways") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val base = (0L until 150L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val rows = base :+ ((999L, base.head._2.clone())) // exact duplicate of vector 0
    val df = rows.toDF("vec_id", "embedding")
    val graph = graft.core.Caches.scoped {
      VectorOps.knnGraph(df, "vec_id", "embedding", 5, 4, 3, 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    // Same candidate generation + same exact re-rank as knnLsh: restricting
    // the graph to a query subset must reproduce knnLsh exactly.
    val lsh = VectorOps.knnLsh(df, "vec_id", "embedding", col("vec_id") < 3, 5, 4, 3, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(graph.filter(_._1 < 3).toSet == lsh,
      "knnGraph restricted to the query subset must equal knnLsh")
    // Identical vectors share every (table, bucket) cell, so the planted
    // duplicate is always a candidate and cosine 1 tops both rankings.
    assert(graph.find(g => g._1 == 999L && g._3 == 1L).map(_._2).contains(0L),
      s"dup's top neighbor must be its source: ${graph.filter(_._1 == 999L).toSeq}")
    assert(graph.find(g => g._1 == 0L && g._3 == 1L).map(_._2).contains(999L))
    // Every vector's ranks are 1..n without gaps.
    graph.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
    }
  }

  test("semDedupClusters: planted duplicates collapse in-cell; distinct vectors stay singletons") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def noisy(c: Array[Float]) = c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.6f)
    val ax = Array(1f, 0f, 0f, 0f); val ay = Array(0f, 1f, 0f, 0f)
    val dup1 = noisy(ax); val dup2 = noisy(ay)
    val rows = Seq(
      (0L, ax), (10L, ay),                      // centroid seeds, one per blob
      (1L, dup1), (2L, dup1.clone()),           // exact duplicate pair, blob x
      (11L, dup2), (12L, dup2.clone()),         // exact duplicate pair, blob y
      (3L, noisy(ax)), (13L, noisy(ay)))        // distinct members
    val df = rows.toDF("vec_id", "embedding")
    val got = graft.core.Caches.scoped {
      VectorOps.semDedupClusters(df, "vec_id", "embedding",
          col("vec_id") === 0 || col("vec_id") === 10, 2, 4, 0.999)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // Identical vectors always share a cell (identical quantization =>
    // identical argmin), so the threshold pairs them regardless of layout.
    assert(got(1L) == 1L && got(2L) == 1L, s"dup pair not collapsed: $got")
    assert(got(11L) == 11L && got(12L) == 11L, s"dup pair not collapsed: $got")
    Seq(0L, 3L, 10L, 13L).foreach(id =>
      assert(got(id) == id, s"$id should be a singleton: $got"))
  }

  test("semDedupClustersFrom over a pre-trained model equals the one-shot semDedupClusters") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    def noisy(c: Array[Float]) = c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.6f)
    val ax = Array(1f, 0f, 0f, 0f); val ay = Array(0f, 1f, 0f, 0f)
    val dup = noisy(ax)
    val df = Seq(
      (0L, ax), (10L, ay),
      (1L, dup), (2L, dup.clone()),
      (3L, noisy(ax)), (13L, noisy(ay))).toDF("vec_id", "embedding")
    val seeds = col("vec_id") === 0 || col("vec_id") === 10
    val (oneShot, fromModel) = graft.core.Caches.scoped {
      val a = VectorOps.semDedupClusters(df, "vec_id", "embedding",
        seeds, 2, 4, 0.999).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val b = VectorOps.semDedupClustersFrom(
          VectorOps.ivfModel(df, "vec_id", "embedding", seeds, 2, 4),
          df, "vec_id", 0.999)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      (a.toSeq, b.toSeq)
    }
    // The deploy lane answers through the model's PERSISTED assignment —
    // the semdedup_from gate shares semdedup's oracle SQL verbatim on the
    // strength of this row-for-row equality.
    assert(fromModel == oneShot, s"From must equal the one-shot: $fromModel vs $oneShot")
  }

  test("projectInt matches the in-memory integer projection") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (0L until 12L).map(id =>
      (id, Array.fill(4)((rnd.nextFloat() - 0.5f) * 3f)))
    val got = VectorOps.projectInt(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", 3, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val expect = rows.map { case (id, v) =>
      val scale = v.map(x => math.abs(x.toDouble)).max / 127.0
      val q = if (scale > 0) v.map(x => math.floor(x / scale + 0.5).toLong)
              else v.map(_ => 0L)
      id -> (0 until 3).map(j =>
        (0 until 4).map(i => q(i) * VectorOps.projWeight(j * 4 + i)).sum).toSeq
    }.toMap
    assert(got == expect)
  }

  test("knnPq: ADC ranking matches the in-memory code/table reference") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0L until 20L).map(id =>
      (id, Array.fill(4)((rnd.nextFloat() - 0.5f) * 2f)))
    val df = rows.toDF("vec_id", "embedding")
    // iters=0 keeps the seed subvectors as codebooks — the reference below
    // needs no Lloyd replay (the trained path shares lloyd() with
    // kmeansAssign, which has its own reference test).
    val got = graft.core.Caches.scoped {
      VectorOps.knnPq(df, "vec_id", "embedding", col("vec_id") < 3, 4,
        col("vec_id").between(10, 13), 0, 2, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    }
    val quant = rows.map { case (id, v) =>
      val scale = v.map(x => math.abs(x.toDouble)).max / 127.0
      id -> (if (scale > 0) v.map(x => math.floor(x / scale + 0.5).toLong)
             else v.map(_ => 0L))
    }.toMap
    val sub = 2
    def slice(v: Array[Long], s: Int) = v.slice(s * sub, (s + 1) * sub).toSeq
    def d2(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val seeds = Seq(10L, 11L, 12L, 13L)
    def code(id: Long, s: Int): Long =
      seeds.map(cid => (d2(slice(quant(id), s), slice(quant(cid), s)), cid)).min._2
    val expect = (0L until 3L).flatMap { qid =>
      (0L until 20L).filter(_ != qid).map { nid =>
        val adc = (0 until 2).map(s =>
          d2(slice(quant(qid), s), slice(quant(code(nid, s)), s))).sum
        (nid, adc)
      }.sortBy { case (nid, adc) => (adc, nid) }.take(4)
        .zipWithIndex.map { case ((nid, adc), i) => (qid, nid, adc, (i + 1).toLong) }
    }.toSet
    assert(got.toSet == expect, s"got ${got.toSet}\nexpect $expect")
    // Guardrails: m must divide dims.
    intercept[IllegalArgumentException] {
      VectorOps.knnPq(df, "vec_id", "embedding", col("vec_id") < 3, 4,
        col("vec_id").between(10, 13), 0, 3, 4)
    }
  }

  test("knnIvfPq: probing all cells equals full-scan PQ") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val rows = (0L until 24L).map(id =>
      (id, Array.fill(4)((rnd.nextFloat() - 0.5f) * 2f)))
    val df = rows.toDF("vec_id", "embedding")
    // 4 coarse cells (seeds 10..13); probing all 4 makes every vector a
    // candidate, so the ADC ranking must equal knnPq's full scan (the
    // codebooks are trained identically from the same seeds/iters).
    val ivfpq = graft.core.Caches.scoped {
      VectorOps.knnIvfPq(df, "vec_id", "embedding", col("vec_id") < 3, 4,
        col("vec_id").between(10, 13), 2, 4, 1, 2, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    }
    val pq = graft.core.Caches.scoped {
      VectorOps.knnPq(df, "vec_id", "embedding", col("vec_id") < 3, 4,
        col("vec_id").between(10, 13), 1, 2, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    }
    assert(ivfpq == pq, s"ivfpq $ivfpq\npq $pq")
    // Restricting probes can only shrink each query's candidate set.
    val one = graft.core.Caches.scoped {
      VectorOps.knnIvfPq(df, "vec_id", "embedding", col("vec_id") < 3, 4,
        col("vec_id").between(10, 13), 2, 1, 1, 2, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val full = pq.map(t => (t._1, t._2))
    assert(one.size <= full.size)
  }

  test("knnIvfPqResidual: residual codes, per-cell tables match the in-memory reference") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (0L until 24L).map(id =>
      (id, Array.fill(4)((rnd.nextFloat() - 0.5f) * 2f)))
    val df = rows.toDF("vec_id", "embedding")
    // coarseIters=0 (centroids = quantized seeds), pqIters=1 (one real
    // Lloyd round over residual slices), probes=4 = all cells.
    val got = graft.core.Caches.scoped {
      VectorOps.knnIvfPqResidual(df, "vec_id", "embedding", col("vec_id") < 3, 4,
        col("vec_id").between(10, 13), 0, 4, 1, 2, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    }
    val quant = rows.map { case (id, v) =>
      val scale = v.map(x => math.abs(x.toDouble)).max / 127.0
      id -> (if (scale > 0) v.map(x => math.floor(x / scale + 0.5).toLong)
             else v.map(_ => 0L))
    }.toMap
    val seeds = Seq(10L, 11L, 12L, 13L)
    val sub = 2
    def d2(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def roundDiv(s: Long, n: Long): Long = {
      val a = (2L * math.abs(s) + n) / (2L * n)
      if (s < 0) -a else a
    }
    def cell(id: Long): Long =
      seeds.map(c => (d2(quant(id).toSeq, quant(c).toSeq), c)).min._2
    def resid(id: Long): Array[Long] =
      quant(id).zip(quant(cell(id))).map { case (a, b) => a - b }
    def slice(v: Array[Long], s: Int) = v.slice(s * sub, (s + 1) * sub).toSeq
    // One Lloyd round per subspace over ALL residual slices.
    val books: IndexedSeq[Map[Long, Seq[Long]]] = (0 until 2).map { s =>
      val c0 = seeds.map(c => c -> slice(resid(c), s)).toMap
      val assign = (0L until 24L).groupBy(id =>
        seeds.map(c => (d2(slice(resid(id), s), c0(c)), c)).min._2)
      seeds.map { c =>
        c -> (assign.get(c) match {
          case Some(ms) => (0 until sub).map(i =>
            roundDiv(ms.map(id => slice(resid(id), s)(i)).sum, ms.length))
          case None => c0(c)
        })
      }.toMap
    }
    def code(id: Long, s: Int): Long =
      seeds.map(c => (d2(slice(resid(id), s), books(s)(c)), c)).min._2
    val expect = (0L until 3L).flatMap { qid =>
      (0L until 24L).filter(_ != qid).map { nid =>
        // Query residual w.r.t. the CANDIDATE'S cell — the residual rule.
        val rq = quant(qid).zip(quant(cell(nid))).map { case (a, b) => a - b }
        val adc = (0 until 2).map(s =>
          d2(slice(rq, s), books(s)(code(nid, s)))).sum
        (nid, adc)
      }.sortBy { case (nid, adc) => (adc, nid) }.take(4)
        .zipWithIndex.map { case ((nid, adc), i) => (qid, nid, adc, (i + 1).toLong) }
    }.toSet
    assert(got == expect, s"got $got\nexpect $expect")
  }

  test("knnBrute ranks by cosine with id tiebreak") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),   // closest to 0
      (2L, Array(0.5f, 0.5f)),
      (3L, Array(0.0f, 1.0f))    // farthest from 0
    ).toDF("vec_id", "embedding")
    val got = VectorOps.knnBrute(df, "vec_id", "embedding", col("vec_id") === 0, 3)
      .orderBy("rnk").collect().map(r => r.getLong(1))
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("hardNegatives: cross-label top-k only; same-label near-dup is excluded") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(0.99f, 0.01f), 1), // nearest overall but SAME label
      (2L, Array(0.9f, 0.1f), 2),   // nearest cross-label
      (3L, Array(0.5f, 0.5f), 2),
      (4L, Array(0.0f, 1.0f), 3)
    ).toDF("vec_id", "embedding", "label")
    val got = VectorOps.hardNegatives(
        df, "vec_id", "embedding", "label", col("vec_id") === 0, 3)
      .orderBy("rnk").collect().map(r => r.getLong(1))
    assert(got.toSeq == Seq(2L, 3L, 4L),
      "the same-label near-duplicate must not appear as a negative")
    // Reference replay on a random corpus: filter-then-rank == rank of the
    // brute scores restricted to cross-label pairs.
    val rnd = new scala.util.Random(17)
    val big = (0L until 60L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() - 0.5f), (i % 4).toInt))
      .toDF("vec_id", "embedding", "label")
    val rows = big.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val ref = (for ((qid, qv, ql) <- rows if qid < 4) yield {
      val negs = rows.filter { case (nid, _, nl) => nid != qid && nl != ql }
        .map { case (nid, nv, _) => (nid, cos(qv, nv)) }
        .sortBy { case (nid, s) => (-s, nid) }.take(5).map(_._1).toSeq
      qid -> negs
    }).toMap
    val gotBig = VectorOps.hardNegatives(
        big, "vec_id", "embedding", "label", col("vec_id") < 4, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1)))
      .groupBy(_._1).map { case (q, ns) =>
        q -> ns.sortBy(_._2).map(_._3).toSeq }
    assert(gotBig == ref)
  }

  test("knnLsh returns a subset of brute-force ranking, exactly re-ranked") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = (0L until 200L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val lsh = VectorOps.knnLsh(df, "vec_id", "embedding", col("vec_id") < 3, 5, 4, 3, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(lsh.nonEmpty)
    // within each query the ranks are 1..n without gaps
    lsh.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // every returned neighbor really is in that query's brute-force order:
    // lsh rank order must be consistent with brute-force pairwise order
    val brute = VectorOps.knnBrute(df, "vec_id", "embedding", col("vec_id") < 3, 200)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    lsh.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._3).map(_._2)
      val bruteRanks = sorted.map(n => brute((q, n)))
      assert(bruteRanks.sorted.toSeq == bruteRanks.toSeq,
        s"LSH order disagrees with exact cosine order for query $q")
    }
  }

  test("knnLshMultiProbe: flips=0 uncapped equals an independent per-bit replay; flips only add candidates") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = (0L until 200L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // INDEPENDENT reimplementation of base-bucket LSH from the public
    // per-bit bucketCol (the original wide-row formulation knnLsh used
    // before it delegated to the multi-probe dataflow) — the
    // cross-implementation check that pins candidates AND ranking.
    def naive(k: Int, tables: Int, bits: Int, dims: Int) = {
      val e = df.select(col("vec_id").as("id"),
        VectorOps.asDouble(col("embedding")).as("v"))
      val bucketed = e.select(col("id"), col("v"),
          explode(array((0 until tables).map(t => struct(lit(t).as("t"),
            VectorOps.bucketCol(col("v"), t, bits, dims).as("bucket"))): _*)).as("tb"))
        .select(col("id"), col("v"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
      val qb = bucketed.filter(col("id") < 3)
        .select(col("id").as("qid"), col("v").as("qv"), col("t"), col("bucket"))
      import org.apache.spark.sql.expressions.Window
      qb.join(bucketed, Seq("t", "bucket"))
        .filter(col("id") =!= col("qid"))
        .select(col("qid"), col("qv"), col("id").as("nid"), col("v"))
        .dropDuplicates("qid", "nid")
        .select(col("qid"), col("nid"),
          VectorOps.cosine(col("qv"), col("v")).as("sim"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))))
        .filter(col("rnk") <= k)
        .select(col("qid"), col("nid"), col("rnk").cast("long").as("rnk"))
    }
    graft.plans.GraftFunctions.register(spark)
    val base = rows(naive(5, 4, 3, 16))
    // knnLsh (which delegates to flips=0 multi-probe) must reproduce it.
    val lsh = rows(VectorOps.knnLsh(
      df, "vec_id", "embedding", col("vec_id") < 3, 5, 4, 3, 16))
    assert(lsh == base, "knnLsh must equal the independent per-bit replay")
    val mp0 = rows(VectorOps.knnLshMultiProbe(
      df, "vec_id", "embedding", col("vec_id") < 3, 5, 4, 3, 0, 16))
    assert(mp0 == base, "flips=0 multi-probe must reproduce base-bucket LSH")
    // flips>0: candidate superset ⇒ per-query hit set vs brute top-5 can
    // only grow, and ranks stay gapless 1..n.
    val brute5 = VectorOps.knnBrute(df, "vec_id", "embedding", col("vec_id") < 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mp2all = VectorOps.knnLshMultiProbe(
      df, "vec_id", "embedding", col("vec_id") < 3, 5, 4, 3, 2, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    mp2all.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
    }
    val mp2 = mp2all.map(t => (t._1, t._2)).toSet
    assert((mp0.map(t => (t._1, t._2)) & brute5).subsetOf(mp2 & brute5),
      "probing flipped buckets lost base-bucket recall")
  }

  test("knnLshMultiProbe bucket cap: bounded cells, deterministic, WindowGroupLimit plan") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 3 tight clusters of 40 co-located vectors each: every cluster shares
    // its bucket in every table, so an uncapped join sees 40-row cells.
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(3)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    val df = (0L until 120L).map { i =>
      val c = centers((i % 3).toInt)
      (i, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f))
    }.toDF("vec_id", "embedding")
    val capped = VectorOps.knnLshMultiProbe(
      df, "vec_id", "embedding", col("vec_id") < 3, 5, 2, 6, 1, 16,
      bucketCap = 8)
    // Deterministic under re-evaluation (the hash-draw rank is content-
    // derived, not partition-derived).
    val a = capped.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = capped.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b && a.nonEmpty)
    // Ranks gapless per query; at cap 8 with 2 tables × 2 probes no query
    // can see more than 32 candidates.
    a.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.size <= 5)
      assert(rs.map(_._3).toSeq.sorted == (1L to rs.size).toSeq)
    }
    // The cap plans as a rank-limited window (WindowGroupLimit) — the
    // property that keeps a corpus-sized degenerate cell out of one task.
    val tree = capped.queryExecution.sparkPlan.treeString
    assert(tree.contains("WindowGroupLimit"),
      s"bucket cap must plan as WindowGroupLimit:\n$tree")
  }

  test("knnLshMultiProbe AutoBucketCap: sizing formula anchored, fixture result equals uncapped") {
    val spark = TestSpark.spark
    import spark.implicits._
    // The occupancy rule itself: 64 × ceil(n / 2^bits), floored at 1024.
    // 10M × 14 bits is the measured SCALE_ANN_r17 anchor (mean occupancy
    // 611 → cap 39,104 — inside the sweep's saturated 32,768..131,072).
    assert(VectorOps.autoBucketCapFor(10000000L, 14) == 39104)
    assert(VectorOps.autoBucketCapFor(1000000L, 14) == 64 * 62)
    assert(VectorOps.autoBucketCapFor(120L, 6) == 1024, "small-n floor")
    assert(VectorOps.autoBucketCapFor(Long.MaxValue / 4, 1) == Int.MaxValue,
      "overflow clamps to uncapped")
    // At fixture scale the floor (1024) sits far above any bucket, so the
    // auto mode must reproduce the uncapped result row-for-row — the
    // same no-op contract the explicit-cap gates rely on.
    val rnd = new scala.util.Random(31)
    val centers = Array.fill(3)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    val df = (0L until 120L).map { i =>
      val c = centers((i % 3).toInt)
      (i, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f))
    }.toDF("vec_id", "embedding")
    def rows(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val auto = rows(VectorOps.knnLshMultiProbe(
      df, "vec_id", "embedding", col("vec_id") < 3, 5, 2, 6, 1, 16,
      bucketCap = VectorOps.AutoBucketCap))
    val uncapped = rows(VectorOps.knnLshMultiProbe(
      df, "vec_id", "embedding", col("vec_id") < 3, 5, 2, 6, 1, 16))
    assert(auto == uncapped, "auto cap must be a no-op at fixture scale")
  }

  test("knnSq8: full-candidate re-rank equals brute force; narrow candidates stay a re-ranked subset") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val rows = (0L until 30L).map(id =>
      (id, Array.fill(6)((rnd.nextFloat() - 0.5f) * 2f)))
    val df = rows.toDF("vec_id", "embedding")
    // cand = corpus − 1 re-ranks everything → exactly the brute ranking.
    val full = VectorOps.knnSq8(df, "vec_id", "embedding", col("vec_id") < 3, 5, 29)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = VectorOps.knnBrute(df, "vec_id", "embedding", col("vec_id") < 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == brute)
    // Narrow candidate lists: every (qid, nid) the SQ8 path returns came
    // from the integer-dot top-8, re-ranked in exact-cosine order.
    val narrow = VectorOps.knnSq8(df, "vec_id", "embedding", col("vec_id") < 3, 5, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def quant(v: Array[Float]): Array[Long] = {
      val s = v.map(x => math.abs(x.toDouble)).max / 127.0
      if (s > 0) v.map(x => math.floor(x.toDouble / s + 0.5).toLong)
      else v.map(_ => 0L)
    }
    val qz = rows.map { case (id, v) => id -> quant(v) }.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def d(x: Array[Double], y: Array[Double]) =
        x.indices.map(i => x(i) * y(i)).sum
      val (ad, bd) = (a.map(_.toDouble), b.map(_.toDouble))
      d(ad, bd) / (math.sqrt(d(ad, ad)) * math.sqrt(d(bd, bd)))
    }
    for (q <- 0L until 3L) {
      val candSet = rows.filter(_._1 != q)
        .map { case (id, _) =>
          (id, qz(q).indices.map(i => qz(q)(i) * qz(id)(i)).sum) }
        .sortBy { case (id, ip) => (-ip, id) }.take(8).map(_._1).toSet
      val exp = rows.filter { case (id, _) => candSet(id) }
        .map { case (id, v) => (id, cos(rows(q.toInt)._2, v)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(5).zipWithIndex.map { case ((id, _), i) => (q, id, (i + 1).toLong) }
      assert(narrow.filter(_._1 == q).sortBy(_._3).toSeq == exp,
        s"query $q")
    }
  }

  test("knnIvfPqResidualRerank: all-probes full pool equals brute force; From variant matches; narrow pool is the re-ranked ADC subset") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val rows = (0L until 24L).map(id =>
      (id, Array.fill(4)((rnd.nextFloat() - 0.5f) * 2f)))
    val df = rows.toDF("vec_id", "embedding")
    val seeds = col("vec_id").between(10, 13)
    val queries = col("vec_id") < 3
    // probes=4 = all cells and cand=23 = corpus−1: the refine sees every
    // candidate, so the result IS the exact brute ranking.
    val full = graft.core.Caches.scoped {
      VectorOps.knnIvfPqResidualRerank(df, "vec_id", "embedding", queries, 5,
          seeds, 2, 4, 1, 2, 4, cand = 23)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val brute = VectorOps.knnBrute(df, "vec_id", "embedding", queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == brute, s"full-pool refine must equal brute: $full vs $brute")
    // Model-reuse parity at a NARROW pool (the deployment path).
    val (oneShot, fromModel) = graft.core.Caches.scoped {
      val a = VectorOps.knnIvfPqResidualRerank(df, "vec_id", "embedding",
          queries, 4, seeds, 2, 2, 1, 2, 4, cand = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val pm = VectorOps.ivfPqResidualModel(
        VectorOps.ivfModel(df, "vec_id", "embedding", seeds, 2, 4), 1, 2)
      val b = VectorOps.knnIvfPqResidualRerankFrom(pm, df, "vec_id",
          "embedding", queries, 4, probes = 2, cand = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      (a, b)
    }
    assert(fromModel == oneShot,
      s"From must equal the one-shot: $fromModel vs $oneShot")
    // Narrow pool: every refined neighbor came from the raw ADC top-cand
    // of the SAME index, re-ranked in exact-cosine order.
    graft.core.Caches.scoped {
      val pm = VectorOps.ivfPqResidualModel(
        VectorOps.ivfModel(df, "vec_id", "embedding", seeds, 2, 4), 1, 2)
      val pool = VectorOps.knnIvfPqResidualFrom(pm, df, "vec_id", queries,
          8, probes = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val refined = VectorOps.knnIvfPqResidualRerankFrom(pm, df, "vec_id",
          "embedding", queries, 4, probes = 2, cand = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      def cos(a: Array[Float], b: Array[Float]): Double = {
        def d(x: Array[Double], y: Array[Double]) =
          x.indices.map(i => x(i) * y(i)).sum
        val (ad, bd) = (a.map(_.toDouble), b.map(_.toDouble))
        d(ad, bd) / (math.sqrt(d(ad, ad)) * math.sqrt(d(bd, bd)))
      }
      val vecs = rows.toMap
      for (q <- 0L until 3L) {
        val exp = pool.filter(_._1 == q).toSeq
          .map { case (_, nid) => (nid, cos(vecs(q), vecs(nid))) }
          .sortBy { case (id, s) => (-s, id) }
          .take(4).zipWithIndex.map { case ((id, _), i) => (q, id, (i + 1).toLong) }
        assert(refined.filter(_._1 == q).sortBy(_._3).toSeq == exp, s"query $q")
      }
    }
  }

  test("knnMips matches brute-force inner products and differs from cosine NN on varied norms") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // Norms drawn from [0.5, 3): MIPS and cosine orders must diverge.
    val rows = (0L until 25L).map { id =>
      val dir = Array.fill(4)(rnd.nextFloat() - 0.5f)
      val n = math.sqrt(dir.map(x => x * x.toDouble).sum)
      val scale = (0.5 + 2.5 * rnd.nextDouble()) / n
      (id, dir.map(x => (x * scale).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = VectorOps.knnMips(df, "vec_id", "embedding", col("vec_id") < 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = (0L until 3L).flatMap { q =>
      val qv = rows(q.toInt)._2.map(_.toDouble)
      rows.filter(_._1 != q)
        .map { case (id, v) =>
          (id, (0 until 4).map(i => qv(i) * v(i).toDouble).sum) }
        .sortBy { case (id, ip) => (-ip, id) }
        .take(5).zipWithIndex
        .map { case ((id, _), i) => (q, id, (i + 1).toLong) }
    }.toSet
    assert(got == expect)
    val cosTop = VectorOps.knnBrute(df, "vec_id", "embedding", col("vec_id") < 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got != cosTop, "fixture must separate MIPS from cosine NN")
  }

  test("groupCentroids matches the sequential quantize-sum-round replay") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (0L until 30L).map(id =>
      (id, (id % 3).toInt, Array.fill(4)((rnd.nextFloat() - 0.5f) * 3f)))
    val got = VectorOps.groupCentroids(
        rows.toDF("vec_id", "label", "embedding"), "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    def roundDiv(s: Long, n: Long): Long = {
      val a = (2L * math.abs(s) + n) / (2L * n)
      if (s < 0) -a else a
    }
    val expect = rows.groupBy(_._2).flatMap { case (lbl, rs) =>
      val qs = rs.map { case (_, _, v) =>
        val scale = v.map(x => math.abs(x.toDouble)).max / 127.0
        if (scale > 0) v.map(x => math.floor(x / scale + 0.5).toLong)
        else v.map(_ => 0L)
      }
      (0 until 4).map { d =>
        (lbl, (d + 1).toLong) ->
          ((roundDiv(qs.map(_(d)).sum, qs.size.toLong), qs.size.toLong))
      }
    }
    assert(got == expect)
  }

  test("groupCentroids: an all-zero group centroids to zeros with its count") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = Seq((1L, 7, Array(0f, 0f)), (2L, 7, Array(0f, 0f)))
    val got = VectorOps.groupCentroids(
        rows.toDF("vec_id", "label", "embedding"), "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet == Set((7, 1L, 0L, 2L), (7, 2L, 0L, 2L)))
  }

  test("clusterBalancedSample caps each cell at the lowest ids and reports pre-cap sizes") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def blob(center: Array[Float], n: Int, from: Long) =
      (0 until n).map(i => (from + i,
        center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f)))
    // One dense blob (over the cap), one sparse (under), one at the edge.
    val rows = blob(Array(1f, 0f, 0f, 0f), 9, 0L) ++
      blob(Array(0f, 1f, 0f, 0f), 2, 100L) ++
      blob(Array(0f, 0f, 1f, 0f), 3, 200L)
    val df = rows.toDF("vec_id", "embedding")
    val pred = col("vec_id") === 0 || col("vec_id") === 100 || col("vec_id") === 200
    val (asg, got) = graft.core.Caches.scoped {
      (VectorOps.kmeansAssign(df, "vec_id", "embedding", pred, 3, 4)
         .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq,
       VectorOps.clusterBalancedSample(df, "vec_id", "embedding", pred, 3, 4, 3)
         .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq)
    }
    // Contract vs the assignment the sampler is built on: per cell, the
    // cap lowest ids with 1-based ranks and the PRE-cap population.
    val byCell = asg.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    val expected = byCell.flatMap { case (cid, ids) =>
      ids.take(3).zipWithIndex.map { case (id, i) =>
        (id, cid, (i + 1).toLong, ids.size.toLong) }
    }.toSet
    assert(got.toSet == expected, s"got ${got.toSet} expected $expected")
    // The dense blob really was capped (9 → 3) and the sparse one kept whole.
    assert(byCell.values.map(_.size).toSeq.sorted == Seq(2, 3, 9))
    assert(got.size == byCell.values.map(ids => math.min(3, ids.size)).sum)
  }
}
