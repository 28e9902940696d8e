package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.core.PropHelpers

/** Degenerate-input behavior of the metrics surface: an empty prefix must
  * yield a well-formed zeroed record (not a null-poisoned json string), an
  * empty barrier list must fail loudly, and the two trigger-parse paths
  * must agree on malformed payloads. */
class SkylineOpsEdgeSpec extends AnyFunSuite with PropHelpers {

  test("skybandRows property: random duplicate-heavy 3D point sets match brute force") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Domain 0..3 per dim forces ties, duplicates, and deep layers.
    val ptsGen = Gen.listOfN(18,
      Gen.zip(Gen.choose(0, 3), Gen.choose(0, 3), Gen.choose(0, 3))
        .map { case (a, b, c) => (a.toDouble, b.toDouble, c.toDouble) })
    def dom(a: (Double, Double, Double), b: (Double, Double, Double)) =
      a._1 <= b._1 && a._2 <= b._2 && a._3 <= b._3 &&
        (a._1 < b._1 || a._2 < b._2 || a._3 < b._3)
    forAll2(ptsGen, Gen.choose(1, 4), n = 8) { (pts, k) =>
      val distinct = pts.distinct
      val expect = pts.flatMap { p =>
        val cnt = distinct.count(q => dom(q, p))
        if (cnt < k) Some((p._1, p._2, p._3, cnt.toLong)) else None
      }.groupBy(identity).view.mapValues(_.size).toMap
      val got = SkylineOps.skybandRows(pts.toDF("x", "y", "z"), Seq("x", "y", "z"), k)
        .collect()
        .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(got == expect, s"k=$k pts=$pts")
    }
  }

  test("skylineLayerRows matches brute-force onion peeling, duplicates keep their layer") {
    val spark = TestSpark.spark
    import spark.implicits._
    val pts = Seq(
      (1.0, 5.0), (1.0, 5.0), (3.0, 3.0), (5.0, 1.0),  // layer 1 (dup on (1,5))
      (2.0, 5.0), (4.0, 3.0), (5.0, 2.0),              // layer 2
      (5.0, 5.0))                                      // layer 3 (beyond request)
    val df = pts.toDF("x", "y")
    val got = SkylineOps.skylineLayerRows(df, Seq("x", "y"), 2)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.size).toMap
    // Brute-force peel with the same dominance rules.
    def dom(a: (Double, Double), b: (Double, Double)) =
      a._1 <= b._1 && a._2 <= b._2 && (a._1 < b._1 || a._2 < b._2)
    var rest = pts
    val expect = (1 to 2).flatMap { l =>
      val sky = rest.filter(p => !rest.exists(q => dom(q, p)))
      val layerRows = sky.map(p => (p._1, p._2, l.toLong))
      rest = rest.filterNot(p => sky.contains(p))
      layerRows
    }.groupBy(identity).view.mapValues(_.size).toMap
    assert(got == expect, s"got $got\nexpect $expect")
    assert(!got.keys.exists(_._3 > 2), "layer beyond the requested depth leaked")
  }

  test("topDominatingSkyline: strict counts, desc rank with dim tiebreak, zero-count points kept") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Frontier = {(1,5), (2,4), (3,3), (0,7)} (+ a duplicate of (1,5), which
    // distinct() collapses and strictness excludes from its own count).
    // Dominated: (4,4) by (2,4)/(3,3); (5,5) by all of a,b,c; (2,6) by
    // (1,5) and (2,4). (0,7) dominates nothing -> count 0, still ranked.
    val df = Seq(
      (1.0, 5.0), (1.0, 5.0), (2.0, 4.0), (3.0, 3.0), (0.0, 7.0),
      (4.0, 4.0), (5.0, 5.0), (2.0, 6.0)).toDF("x", "y")
    val got = SkylineOps.topDominatingSkyline(df, Seq("x", "y"), 10)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (2.0, 4.0, 3L, 1L),   // dominates (4,4), (5,5), (2,6)
      (1.0, 5.0, 2L, 2L),   // dominates (5,5), (2,6); tie broken by dims
      (3.0, 3.0, 2L, 3L),   // dominates (4,4), (5,5)
      (0.0, 7.0, 0L, 4L)),  // dominates nothing
      s"got $got")
    // k truncates the ranking.
    assert(SkylineOps.topDominatingSkyline(df, Seq("x", "y"), 2).count() == 2)
  }

  test("skybandRows matches the brute-force distinct-dominator count; 1-skyband = skyline") {
    val spark = TestSpark.spark
    import spark.implicits._
    // (1,1) dominates everything, so deeper layers carry points with
    // dominator counts ABOVE their layer index ((3,3) is in layer 3 with
    // 2 dominators; (5,5) deeper with 7) — the filter, not the peeling,
    // must decide membership. Duplicate rows of (1,5) both survive.
    val pts = Seq(
      (1.0, 5.0), (1.0, 5.0), (3.0, 3.0), (5.0, 1.0), (1.0, 1.0),
      (2.0, 5.0), (4.0, 3.0), (5.0, 2.0), (5.0, 5.0), (2.0, 2.0))
    val df = pts.toDF("x", "y")
    def dom(a: (Double, Double), b: (Double, Double)) =
      a._1 <= b._1 && a._2 <= b._2 && (a._1 < b._1 || a._2 < b._2)
    val distinct = pts.distinct
    for (k <- 1 to 3) {
      val expect = pts.flatMap { p =>
        val cnt = distinct.count(q => dom(q, p))
        if (cnt < k) Some((p._1, p._2, cnt.toLong)) else None
      }.groupBy(identity).view.mapValues(_.size).toMap
      val got = SkylineOps.skybandRows(df, Seq("x", "y"), k)
        .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(got == expect, s"k=$k: got $got\nexpect $expect")
    }
    // 1-skyband rows = skyline rows (with count 0).
    val sky = SkylineOps.skylineRows(df, Seq("x", "y"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).sorted
    val band1 = SkylineOps.skybandRows(df, Seq("x", "y"), 1)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).sorted
    assert(band1.sameElements(sky))
  }

  test("metricsJson on empty input emits a zeroed record, not null") {
    val spark = TestSpark.spark
    import spark.implicits._
    val empty = Seq.empty[(Double, Double)].toDF("x", "y")
    val got = SkylineOps.metricsJson(empty, Seq("x", "y"),
      SkylineOps.dimPartitionCol(array(col("x")), 10.0, 4), 4, "9").head()
    assert(!got.isNullAt(0))
    val json = got.getString(0)
    assert(json.contains("\"query_id\": \"9\""))
    assert(json.contains("\"record_count\": 0"))
    assert(json.contains("\"skyline_size\": 0"))
    assert(json.contains("\"optimality\": 0.0000"))
  }

  test("triggerCadence refuses an empty barrier list") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, 1.0, 2.0)).toDF("id", "x", "y")
    intercept[IllegalArgumentException] {
      SkylineOps.triggerCadence(df, "id", Seq("x", "y"),
        SkylineOps.dimPartitionCol(array(col("x")), 10.0, 4), 4, Seq.empty)
    }
  }

  test("triggerCadence: single-pass output matches per-barrier records, incl. empty prefix") {
    val spark = TestSpark.spark
    import spark.implicits._
    // ids 10..29: barrier 5 has an EMPTY prefix (must still emit a zeroed
    // record via the left-join reintroduction), 15 a partial one, 100 all.
    val df = (10L until 30L).map(i => (i, i.toDouble % 7, i.toDouble % 11))
      .toDF("id", "x", "y")
    val pid = SkylineOps.dimPartitionCol(array(col("x")), 7.0, 4)
    val got = SkylineOps.triggerCadence(df, "id", Seq("x", "y"), pid, 4,
      Seq(5L, 15L, 100L)).collect().map(_.getString(0))
    assert(got.length == 3)
    assert(got(0).contains("\"query_id\": \"1\"") &&
      got(0).contains("\"record_count\": 0") &&
      got(0).contains("\"optimality\": 0.0000"), s"empty prefix: ${got(0)}")
    // Each barrier's record must equal the naive per-prefix metricsJson.
    Seq((5L, 0), (15L, 1), (100L, 2)).foreach { case (b, i) =>
      val expect = SkylineOps.metricsJson(df.filter(col("id") <= b),
        Seq("x", "y"), pid, 4, (i + 1).toString).head().getString(0)
      assert(got(i) == expect, s"barrier $b: ${got(i)} != $expect")
    }
  }

  test("trigger barrier parse: one rule for column and state-machine paths") {
    val spark = TestSpark.spark
    import spark.implicits._
    val payloads = Seq("q1,500", "q2", "q3,abc", "q4, 42", "q5,-7")
    val colSide = graft.sources.WireFormat
      .parseTriggers(payloads.toDF("value"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    payloads.foreach { p =>
      assert(graft.streaming.StreamingSkyline.requiredCount(p) == colSide(p),
        s"column vs state-machine parse disagree on '$p'")
    }
    assert(colSide("q1,500") == 500L)
    assert(colSide("q2") == 0L,     "D5: no comma -> 0")
    assert(colSide("q3,abc") == 0L, "malformed count -> 0, not a crash")
    assert(colSide("q4, 42") == 0L, "whitespace is malformed on BOTH paths")
    assert(colSide("q5,-7") == -7L)
  }

  test("skylineModel consumers are row-for-row the re-peeling operators (random duplicate-heavy sets)") {
    val spark = TestSpark.spark
    import spark.implicits._
    def multiset(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    val ptsGen = Gen.listOfN(16,
      Gen.zip(Gen.choose(0, 3), Gen.choose(0, 3))
        .map { case (a, b) => (a.toDouble, b.toDouble) })
    forAll2(ptsGen, Gen.choose(1, 3), n = 6) { (pts, k) =>
      graft.core.Caches.scoped {
        val df = pts.toDF("x", "y")
        val m = SkylineOps.skylineModel(df, Seq("x", "y"), 3)
        assert(
          multiset(SkylineOps.layerRowsFrom(m, df)
              .filter(col("layer") <= 2).collect()) ==
            multiset(SkylineOps.skylineLayerRows(df, Seq("x", "y"), 2).collect()),
          s"layers diverged: $pts")
        assert(
          multiset(SkylineOps.skybandRowsFrom(m, df, k).collect()) ==
            multiset(SkylineOps.skybandRows(df, Seq("x", "y"), k).collect()),
          s"skyband diverged: k=$k $pts")
        assert(
          multiset(SkylineOps.topDominatingFrom(m, df, 10).collect()) ==
            multiset(SkylineOps.topDominatingSkyline(df, Seq("x", "y"), 10).collect()),
          s"topdom diverged: $pts")
      }
    }
  }
}
