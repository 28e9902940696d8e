package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class BloomOpsSpec extends AnyFunSuite {

  /** Corpus: eval docs e1/e2; train t1 copies an e1 span verbatim, t2 is
    * clean, t3 copies an e2 span. 4-token spans. */
  private def corpus() = {
    val spark = TestSpark.spark
    import spark.implicits._
    val eval = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val train = Seq(
      (1L, "xx yy beta gamma delta epsilon zz"),
      (2L, "totally unrelated words here nothing shared"),
      (3L, "prefix one two three four suffix tail")
    ).toDF("doc_id", "text")
    (train, eval)
  }

  test("no false negatives: every exactly-contaminated doc is bloom-flagged") {
    val (train, eval) = corpus()
    val r = BloomOps.bloomDecontam(train, eval, "doc_id", 4).collect().head
    val (nTrain, nBloom, nExact, nFp, nBits) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nTrain == 3L)
    assert(nExact == 2L)          // t1 and t3 share spans verbatim
    assert(nBloom >= nExact)      // bloom ⊇ exact, structurally
    assert(nFp == nBloom - nExact)
    // 3 positions per span, a handful of spans: the bitset is tiny and
    // bounded by 3 × spans (dedup may collapse collisions).
    assert(nBits > 0 && nBits <= 3L * 2 * 4)
  }

  test("withExact=false drops the probe branch but keeps bloom flags") {
    val (train, eval) = corpus()
    val probe = BloomOps.bloomDecontam(train, eval, "doc_id", 4).collect().head
    val prod = BloomOps.bloomDecontam(train, eval, "doc_id", 4,
      withExact = false).collect().head
    assert(prod.getLong(1) == probe.getLong(1)) // same bloom count
    assert(prod.getLong(2) == 0L && prod.getLong(3) == prod.getLong(1))
  }

  test("bloomModel + applyBloom: per-doc flags agree with bloomDecontam's aggregate count") {
    val (train, eval) = corpus()
    val m = BloomOps.bloomModel(eval, 4)
    assert(m.n == 4 && m.bits.nonEmpty && m.bits.sameElements(m.bits.sorted))
    assert(m.bits.forall(p => p >= 0 && p < BloomOps.Bits))
    val spark = TestSpark.spark
    import spark.implicits._
    // A doc shorter than n tokens must still appear, unflagged — a plain
    // explode dropped it from the keep-list entirely.
    val trainPlus = train.unionAll(Seq((4L, "too short")).toDF("doc_id", "text"))
    val flags = BloomOps.applyBloom(m, trainPlus, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flags.keySet == Set(1L, 2L, 3L, 4L))
    assert(flags(4L) == 0L, "a sub-n-token doc must pass through unflagged")
    // Exactly-contaminated docs must flag (no false negatives).
    assert(flags(1L) == 1L && flags(3L) == 1L)
    // The summed flags equal the accounting operator's bloom count.
    val agg = BloomOps.bloomDecontam(train, eval, "doc_id", 4).collect().head
    assert(flags.values.sum == agg.getLong(1),
      s"applyBloom flags ${flags.values.sum} != bloomDecontam ${agg.getLong(1)}")
  }

  test("hash positions stay inside the 2^16 filter") {
    val spark = TestSpark.spark
    import spark.implicits._
    val hs = (0 until 200).map(i => s"probe $i").toDF("s")
      .select(md5(col("s")).as("h"))
    val ps = hs.select(explode(array(
        BloomOps.Offsets.map(o => BloomOps.pos(col("h"), o)): _*)).as("p"))
      .agg(min("p"), max("p")).collect().head
    assert(ps.getInt(0) >= 0 && ps.getInt(1) < BloomOps.Bits)
  }
}
