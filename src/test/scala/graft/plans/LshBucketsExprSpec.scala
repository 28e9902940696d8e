package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{lit => slit, _}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.TestSpark

class LshBucketsExprSpec extends AnyFunSuite {

  private val dims = 16
  private val bits = 4
  private val tables = 3

  private def planes: Array[Double] =
    Array.tabulate(tables * bits * dims)(j =>
      graft.operators.VectorOps.planeValue(j))

  /** Reference: the per-bit bucketCol formula as a scalar loop. */
  private def ref(v: Array[Double]): Array[Int] = {
    val p = planes
    (0 until tables).map { t =>
      (0 until bits).map { b =>
        val off = (t * bits + b) * dims
        val s = (0 until dims).map(i => v(i) * p(off + i)).sum
        if (s >= 0) 1 << b else 0
      }.sum
    }.toArray
  }

  private def lit(a: Array[Double]): Literal =
    Literal.create(new GenericArrayData(a), ArrayType(DoubleType))

  test("a NULL literal plane matrix fails analysis cleanly, not with an NPE") {
    val r = LshBuckets(lit(Array.fill(dims)(0.0)),
      Literal.create(null, ArrayType(DoubleType)), bits, dims)
      .checkInputDataTypes()
    assert(r.isFailure, "null plane matrix must be a TypeCheckFailure")
  }

  test("interpreted eval matches the per-bit reference") {
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 200) {
      val v = Array.fill(dims)(rnd.nextDouble() * 2 - 1)
      val got = LshBuckets(lit(v), lit(planes), bits, dims).eval(null)
        .asInstanceOf[ArrayData].toIntArray()
      assert(got.toSeq == ref(v).toSeq)
    }
  }

  test("codegen path equals bucketCol per table on a DataFrame") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val df = (0 until 300).map(i =>
      (i.toLong, Array.fill(dims)(rnd.nextFloat() * 2 - 1))).toDF("id", "v")
      .select(col("id"), transform(col("v"), _.cast("double")).as("v"))
    val planesCol = array(planes.map(slit(_)): _*)
    val both = df.select(col("id"),
      call_function(GraftFunctions.LshBucketsName, col("v"), planesCol,
        slit(bits), slit(dims)).as("fast"),
      array((0 until tables).map(t =>
        graft.operators.VectorOps.bucketCol(col("v"), t, bits, dims)): _*)
        .as("slow"))
    val bad = both.filter(not(col("fast") <=> col("slow"))).count()
    assert(bad == 0, "native buckets diverged from the per-bit formula")
  }

  test("null on dims drift and on a null vector; rejects non-literal planes") {
    // Any vector whose length differs from the declared dims → null,
    // INCLUDING lengths that happen to divide the plane matrix (the
    // silent-garbage case a divisibility-only guard would accept).
    assert(LshBuckets(lit(Array.fill(dims / 2)(0.5)), lit(planes),
      bits, dims).eval(null) == null)
    assert(LshBuckets(lit(Array.fill(dims + 1)(0.5)), lit(planes),
      bits, dims).eval(null) == null)
    assert(LshBuckets(
      Literal.create(null, ArrayType(DoubleType)), lit(planes), bits, dims)
      .eval(null) == null)
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    import spark.implicits._
    // Non-foldable plane matrix must be rejected at analysis time.
    val df = Seq((Array.fill(dims)(0.1), Array.fill(dims * bits)(0.2)))
      .toDF("v", "p")
      .select(transform(col("v"), _.cast("double")).as("v"),
        transform(col("p"), _.cast("double")).as("p"))
    val err = intercept[Exception] {
      df.select(call_function(GraftFunctions.LshBucketsName,
        col("v"), col("p"), slit(bits), slit(dims))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("foldable"),
      s"expected a foldable-planes analysis error, got: ${err.getMessage}")
  }
}
