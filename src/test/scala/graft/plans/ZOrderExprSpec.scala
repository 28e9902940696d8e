package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._

import graft.TestSpark

class ZOrderExprSpec extends AnyFunSuite {

  /** Reference interleave: bit-by-bit loop. */
  private def ref(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("interpreted eval matches the bit-by-bit reference") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 500) {
      val x = rnd.nextInt(65536).toLong
      val y = rnd.nextInt(65536).toLong
      val got = ZOrder2(Literal(x), Literal(y)).eval(null)
      assert(got == ref(x, y), s"x=$x y=$y")
    }
    // Masking: bits above 15 are dropped.
    assert(ZOrder2(Literal(65536L + 5L), Literal(0L)).eval(null) == ref(5L, 0L))
  }

  test("codegen path (DataFrame select) agrees with interpreted eval") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = (0 until 2000).map { i => (i.toLong * 131 % 65536, i.toLong * 977 % 65536) }
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), call_function("graft_zorder", col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r => assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1))) }
  }

  test("top-bit buckets are aligned tiles: every 6-bit bucket bounds both dims to 128") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = for (x <- 0 until 1024 by 7; y <- 0 until 1024 by 11) yield (x.toLong, y.toLong)
    val stats = graft.operators.LayoutOps.bucketStats(
      rows.toDF("x", "y"),
      shiftright(graft.operators.LayoutOps.zkey(col("x"), col("y")), 14),
      col("x"), col("y")).collect()
    assert(stats.length == 64)
    stats.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 127, s"x span in bucket ${r.getLong(0)}")
      assert(r.getLong(5) - r.getLong(4) <= 127, s"y span in bucket ${r.getLong(0)}")
      // Tile corners are 128-aligned — the bucket IS a quadtree cell.
      assert(r.getLong(2) % 128 + (r.getLong(3) - r.getLong(2)) <= 127)
    }
  }

  test("null propagates") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftFunctions.register(spark)
    val r = Seq((Some(3L), Option.empty[Long])).toDF("x", "y")
      .select(call_function("graft_zorder", col("x"), col("y"))).collect()
    assert(r.head.isNullAt(0))
  }
}
