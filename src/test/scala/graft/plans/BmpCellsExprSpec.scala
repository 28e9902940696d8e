package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.TestSpark

class BmpCellsExprSpec extends AnyFunSuite {

  /** Minimal spec-valid 24bpp bottom-up BMP: 54-byte header + pixel
    * bytes (possibly truncated vs the stride — the zero-fill case). */
  private def bmp(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
    val b = new Array[Byte](54 + pixels.length)
    def putLE(off: Int, v: Long, n: Int): Unit =
      (0 until n).foreach(i => b(off + i) = ((v >> (8 * i)) & 0xff).toByte)
    putLE(0, 0x4D42L, 2)  // "BM"
    putLE(10, 54L, 4)     // data offset
    putLE(14, 40L, 4)     // BITMAPINFOHEADER
    putLE(18, w.toLong, 4)
    putLE(22, h.toLong, 4)
    putLE(28, 24L, 2)     // 24bpp
    System.arraycopy(pixels, 0, b, 54, pixels.length)
    b
  }

  /** Scalar reference: the former column lattice (floor division toward
    * −∞, zero fill outside the blob). */
  private def ref(blob: Array[Byte], grid: Int): Seq[Long] = {
    def leU(off: Int, n: Int): Long =
      (0 until n).map(i => (blob(off + i) & 0xffL) << (8 * i)).sum
    val w = leU(18, 4); val h = leU(22, 4)
    val o = leU(10, 4); val rs = (w * 3 + 3) / 4 * 4
    (0 until grid * grid).map { k =>
      val i = k % grid; val j = k / grid
      val x = Math.floorDiv((w - 1) * i, (grid - 1).toLong)
      val y = Math.floorDiv((h - 1) * j, (grid - 1).toLong)
      val base = o + rs * (h - 1 - y) + x * 3
      (0 until 3).map { c =>
        val p = base + c
        if (p >= 0 && p < blob.length) (blob(p.toInt) & 0xff).toLong else 0L
      }.sum
    }
  }

  test("interpreted eval matches the lattice reference (incl. truncated pixel arrays and degenerate dims)") {
    val rnd = new scala.util.Random(31)
    for ((w, h) <- Seq((1, 1), (4, 3), (7, 7), (16, 2));
         grid <- Seq(2, 4, 7)) {
      val full = ((w * 3 + 3) / 4 * 4) * h
      for (len <- Seq(full, full / 2, 0)) {
        val blob = bmp(w, h, Array.fill(len)(rnd.nextInt(256).toByte))
        val got = BmpCells(Literal.create(blob, BinaryType), grid)
          .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
        assert(got == ref(blob, grid), s"w=$w h=$h grid=$grid len=$len")
      }
    }
  }

  test("header-gate failures are NULL") {
    assert(BmpCells(Literal.create("not a bmp".getBytes, BinaryType), 4)
      .eval(null) == null)
    assert(BmpCells(Literal.create(null, BinaryType), 4).eval(null) == null)
    val huge = bmp(2, 2, Array.empty[Byte])
    huge(21) = 0x40 // w >= 2^22 -> reject
    assert(BmpCells(Literal.create(huge, BinaryType), 4).eval(null) == null)
  }

  test("codegen path equals the interpreted path on a DataFrame") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val rows = (0 until 30).map { i =>
      val w = 1 + rnd.nextInt(8); val h = 1 + rnd.nextInt(8)
      val full = ((w * 3 + 3) / 4 * 4) * h
      (i.toLong, bmp(w, h, Array.fill(rnd.nextInt(full + 1))(
        rnd.nextInt(256).toByte)))
    }
    val got = rows.toDF("id", "blob")
      .select(col("id"), call_function(GraftFunctions.BmpCellsName,
        col("blob"), lit(4)).as("cs"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Long](1)).map(_.toSeq)).toMap
    rows.foreach { case (id, blob) =>
      val exp = Option(BmpCells(Literal.create(blob, BinaryType), 4)
        .eval(null)).map(_.asInstanceOf[ArrayData].toLongArray().toSeq)
      assert(got(id) == exp, s"id=$id")
    }
  }
}
