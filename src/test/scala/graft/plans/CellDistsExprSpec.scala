package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{lit => slit, _}
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.TestSpark

class CellDistsExprSpec extends AnyFunSuite {

  private val dims = 8
  private val k = 5

  private def cents: Array[Long] =
    Array.tabulate(k * dims)(j => ((j * 37) % 255 - 127).toLong)

  /** Reference: the per-centroid integer squared-L2 as a scalar loop. */
  private def ref(v: Array[Long]): Array[Long] = {
    val c = cents
    (0 until k).map { j =>
      (0 until dims).map { i =>
        val d = v(i) - c(j * dims + i); d * d
      }.sum
    }.toArray
  }

  private def lit(a: Array[Long]): Literal =
    Literal.create(new GenericArrayData(a), ArrayType(LongType))

  test("a NULL literal centroid matrix fails analysis cleanly, not with an NPE") {
    val r = CellDists(lit(Array.fill(dims)(0L)),
      Literal.create(null, ArrayType(LongType)), dims)
      .checkInputDataTypes()
    assert(r.isFailure, "null centroid matrix must be a TypeCheckFailure")
  }

  test("interpreted eval matches the per-centroid reference") {
    val rnd = new scala.util.Random(17)
    for (_ <- 0 until 200) {
      val v = Array.fill(dims)((rnd.nextInt(255) - 127).toLong)
      val got = CellDists(lit(v), lit(cents), dims).eval(null)
        .asInstanceOf[ArrayData].toLongArray()
      assert(got.toSeq == ref(v).toSeq)
    }
  }

  test("codegen path equals the aggregate-zip_with formulation on a DataFrame") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val df = (0 until 300).map(i =>
      (i.toLong, Array.fill(dims)((rnd.nextInt(255) - 127).toLong)))
      .toDF("id", "v")
    val centsCol = array(cents.map(slit(_)): _*)
    def hof(j: Int) = aggregate(
      zip_with(col("v"),
        array(cents.slice(j * dims, (j + 1) * dims).map(slit(_)): _*),
        (x, y) => (x - y) * (x - y)),
      slit(0L), _ + _)
    val both = df.select(col("id"),
      call_function(GraftFunctions.CellDistsName, col("v"), centsCol,
        slit(dims)).as("fast"),
      array((0 until k).map(hof): _*).as("slow"))
    val bad = both.filter(not(col("fast") <=> col("slow"))).count()
    assert(bad == 0, "native cell distances diverged from the HOF formula")
  }

  test("null on dims drift and null vector; rejects non-literal centroids") {
    // Drifted vector lengths → null, INCLUDING lengths that divide the
    // centroid matrix (silent-garbage case under a divisibility guard).
    assert(CellDists(lit(Array.fill(dims / 2)(1L)), lit(cents), dims)
      .eval(null) == null)
    assert(CellDists(lit(Array.fill(dims + 1)(1L)), lit(cents), dims)
      .eval(null) == null)
    assert(CellDists(
      Literal.create(null, ArrayType(LongType)), lit(cents), dims)
      .eval(null) == null)
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Array.fill(dims)(1L), Array.fill(dims * k)(2L))).toDF("v", "c")
    val err = intercept[Exception] {
      df.select(call_function(GraftFunctions.CellDistsName,
        col("v"), col("c"), slit(dims))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("foldable"),
      s"expected a foldable-centroids analysis error, got: ${err.getMessage}")
  }
}
