package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.functions.SkylineAgg.skyline_agg

/** DataFrame-surface generator checks: partition-invariance of the
  * distributed id-space split, and the report's 200k skyline-size
  * envelopes per distribution (FIXTURES.md §2 / pdf p.16 §5.1 — our RNG
  * stream differs from the Python original, so envelopes not exact counts).
  */
class DataGenSourceSpec extends AnyFunSuite {

  test("generation is invariant under partitioning") {
    val spark = TestSpark.spark
    val a = DataGenSource.pointsDF(spark, "anti_correlated", 42L, 1000, 2, 0, 10000, 4)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val b = DataGenSource.pointsDF(spark, "anti_correlated", 42L, 1000, 2, 0, 10000, 16)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(a.sameElements(b))
  }

  test("200k-point skyline-size envelopes per distribution (2D)") {
    val spark = TestSpark.spark
    def skySize(m: String): Long =
      DataGenSource.pointsDF(spark, m, 42L, 200000, 2, 0, 10000, 8)
        .agg(skyline_agg(col("values")).as("sky"))
        .select(size(col("sky")).cast("long")).head().getLong(0)
    val (u, c, a) = (skySize("uniform"), skySize("correlated"), skySize("anti_correlated"))
    // report at 200k: uniform 8, correlated 1716 (all duplicates), anti 2961
    assert(u < 100, s"uniform skyline should be tiny, got $u")
    assert(c > 100 && c < 50000, s"correlated skyline out of envelope: $c")
    assert(a > 500 && a < 50000, s"anti-correlated skyline out of envelope: $a")
    assert(a > u && c > u)
  }
}
