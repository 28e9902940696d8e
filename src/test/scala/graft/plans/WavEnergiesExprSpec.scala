package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.TestSpark

class WavEnergiesExprSpec extends AnyFunSuite {

  /** Minimal spec-valid 8-bit mono WAV: 44-byte header + payload. */
  private def wav(payload: Array[Byte], claimed: Int): Array[Byte] = {
    val b = new Array[Byte](44 + payload.length)
    def putLE(off: Int, v: Long, n: Int): Unit =
      (0 until n).foreach(i => b(off + i) = ((v >> (8 * i)) & 0xff).toByte)
    putLE(0, 0x46464952L, 4)  // RIFF
    putLE(8, 0x45564157L, 4)  // WAVE
    putLE(12, 0x20746D66L, 4) // fmt_
    putLE(20, 1, 2)           // PCM
    putLE(22, 1, 2)           // mono
    putLE(34, 8, 2)           // 8-bit
    putLE(36, 0x61746164L, 4) // data
    putLE(40, claimed.toLong, 4)
    System.arraycopy(payload, 0, b, 44, payload.length)
    b
  }

  /** Scalar reference: the column formula's per-segment fold. */
  private def ref(payload: Array[Byte], claimed: Int, segs: Int): Seq[Long] = {
    val n = math.min(claimed, payload.length)
    (0 until segs).map { s =>
      val lo = s.toLong * n / segs
      val hi = (s + 1).toLong * n / segs - 1
      (lo to hi).map { k =>
        val v = (payload(k.toInt) & 0xff) - 128L; v * v
      }.sum
    }
  }

  test("interpreted eval matches the scalar reference (incl. truncated claims and uneven segments)") {
    val rnd = new scala.util.Random(19)
    for (len <- Seq(0, 1, 5, 16, 17, 100); segs <- Seq(2, 4, 16)) {
      val payload = Array.fill(len)(rnd.nextInt(256).toByte)
      for (claimed <- Seq(len, len + 7, math.max(0, len - 3))) {
        val got = WavEnergies(Literal.create(wav(payload, claimed), BinaryType),
          segs).eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
        assert(got == ref(payload, claimed, segs),
          s"len=$len claimed=$claimed segs=$segs")
      }
    }
  }

  test("header-gate failures and null blobs are NULL") {
    assert(WavEnergies(Literal.create("xx".getBytes, BinaryType), 4)
      .eval(null) == null)
    assert(WavEnergies(Literal.create(null, BinaryType), 4).eval(null) == null)
    val tooBig = wav(Array[Byte](1, 2, 3), 3)
    tooBig(43) = 0x40 // claimed length >= 2^30 -> reject
    assert(WavEnergies(Literal.create(tooBig, BinaryType), 4).eval(null) == null)
  }

  test("codegen path equals the interpreted path on a DataFrame") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (0 until 40).map { i =>
      (i.toLong, wav(Array.fill(3 + rnd.nextInt(60))(rnd.nextInt(256).toByte),
        3 + rnd.nextInt(70)))
    }
    val got = rows.toDF("id", "blob")
      .select(col("id"), call_function(GraftFunctions.WavEnergiesName,
        col("blob"), lit(4)).as("es"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Long](1)).map(_.toSeq)).toMap
    rows.foreach { case (id, blob) =>
      val exp = Option(WavEnergies(Literal.create(blob, BinaryType), 4)
        .eval(null)).map(_.asInstanceOf[ArrayData].toLongArray().toSeq)
      assert(got(id) == exp, s"id=$id")
    }
  }
}
