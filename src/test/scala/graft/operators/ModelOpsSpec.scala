package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class ModelOpsSpec extends AnyFunSuite {

  /** Documents where n_tok ≥ 4 ⟺ over-budget (n_chars ≥ 300): the stump
    * on n_tok separates perfectly at θ = 4; the other features are
    * constant-ish and cannot do better than the class prior. */
  private def docsDf() = {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq(
      (1L, "aa bb", 100L), (2L, "cc dd", 120L), (3L, "ee ff gg", 250L),
      (4L, "aa bb cc dd", 350L), (5L, "aa bb cc dd ee", 400L),
      (6L, "aa bb cc dd ee ff", 500L)
    ).toDF("doc_id", "text", "n_chars")
  }

  test("stumpTrain finds the perfect separator and exact error counts") {
    val rows = ModelOps.stumpTrain(docsDf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // n_tok: thresholds swept over {2, 3, 4, 5, 6}; θ=4 → 0 errors.
    assert(rows.contains(("n_tok", 4L, 0L)), s"got $rows")
    // Every feature reports at most the minority-class error count (the
    // sweep can always do at least as well as predicting the majority —
    // here 3/3, and the all-(-1) rule is reachable only when some value
    // sits above every positive, so ≤ 3 holds as a sanity bound).
    assert(rows.forall(_._3 <= 3L), s"got $rows")
    assert(rows.map(_._1) == Set("n_tok", "n_long", "n_stop"))
  }

  test("stumpTrain error counts match a brute-force sweep") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = docsDf()
    val feats = df.select(
      when(col("n_chars") >= ModelOps.CharBudget, 1L).otherwise(-1L).as("y"),
      size(split(col("text"), " ")).cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val best = feats.map(_._2).distinct.map { thr =>
      val errs = feats.count { case (y, v) =>
        (v >= thr && y == -1L) || (v < thr && y == 1L) }
      (thr, errs.toLong)
    }.minBy { case (t, e) => (e, t) }
    val got = ModelOps.stumpTrain(df).filter(col("feature") === "n_tok")
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(got == best)
  }

  test("stumpConfusion cells cover the corpus and match the best stump") {
    val cells = ModelOps.stumpConfusion(docsDf()).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(cells.values.sum == 6L)
    // Perfect separator: only the diagonal cells exist.
    assert(cells.keySet == Set((1L, 1L), (-1L, -1L)), s"got $cells")
    assert(cells((1L, 1L)) == 3L && cells((-1L, -1L)) == 3L)
  }

  test("ties at equal error counts break toward the smallest threshold") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Single positive doc: every θ ≤ its n_tok yields 0 errors; the sweep
    // must pick the smallest distinct value as θ.
    val one = Seq((1L, "aa bb cc", 400L)).toDF("doc_id", "text", "n_chars")
    val got = ModelOps.stumpTrain(one).filter(col("feature") === "n_tok")
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(got == ((3L, 0L)))
  }
}
