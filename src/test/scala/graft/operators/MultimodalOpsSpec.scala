package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class MultimodalOpsSpec extends AnyFunSuite {

  test("byteProfile: hand-computed byte-value histogram; empty payload -> zeros") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 'A'=0x41 -> bin 2, 'b'=0x62 -> bin 3, ' '=0x20 -> bin 1,
    // '9'=0x39 -> bin 1, '~'=0x7e -> bin 3.
    val got = Seq("Ab 9~", "").toDF("text")
      .select(MultimodalOps.byteProfile(
        MultimodalOps.asBlob(col("text"))).as("p"))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(got(0) == Seq(0L, 2L, 1L, 2L, 0L, 0L, 0L, 0L))
    assert(got(1) == Seq.fill(8)(0L))
    // Multi-byte UTF-8 counts BYTES, not characters: 'é' = 0xC3 0xA9 ->
    // bins 6 and 5.
    val multi = Seq("é").toDF("text")
      .select(MultimodalOps.byteProfile(
        MultimodalOps.asBlob(col("text"))).as("p"))
      .head().getSeq[Long](0).toSeq
    assert(multi == Seq(0L, 0L, 0L, 0L, 0L, 1L, 1L, 0L))
  }
}
