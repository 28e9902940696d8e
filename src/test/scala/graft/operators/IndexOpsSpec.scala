package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IndexOpsSpec extends AnyFunSuite {

  private def corpus() = {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq(
      (1L, "red blue red"),
      (2L, "blue green"),
      (3L, "red red red blue"),
      (4L, "green"),
      (5L, "red  blue") // double space → empty token must drop
    ).toDF("doc_id", "text")
  }

  test("postings: df/cf exact, sample capped to the lowest doc_ids") {
    val got = IndexOps.postings(corpus(), "doc_id", minDf = 2L, cap = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    // red: docs {1,3,5} df=3 cf=2+3+1=6, sample "1,3" (cap 2)
    // blue: docs {1,2,3,5} df=4 cf=4, sample "1,2"
    // green: df=2 cf=2, sample "2,4"
    assert(got == Set(
      ("red", 3L, 6L, "1,3"),
      ("blue", 4L, 4L, "1,2"),
      ("green", 2L, 2L, "2,4")))
  }

  test("minDf drops rare tokens") {
    val toks = IndexOps.postings(corpus(), "doc_id", minDf = 4L, cap = 2)
      .collect().map(_.getString(0)).toSet
    assert(toks == Set("blue"))
  }

  test("conjunctive: all terms required, per-term tf threshold applies") {
    // red AND blue: docs 1 (2+1), 3 (3+1), 5 (1+1) — doc2 has no red.
    val got = IndexOps.conjunctive(corpus(), "doc_id",
        Seq("red", "blue"), minTf = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 3L), (3L, 4L), (5L, 2L)))
    val strict = IndexOps.conjunctive(corpus(), "doc_id",
        Seq("red", "blue"), minTf = 2L)
      .collect().map(_.getLong(0)).toSet
    assert(strict == Set.empty) // no doc has blue twice
  }
}
