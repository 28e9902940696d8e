package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class ShinglesExprSpec extends AnyFunSuite {

  /** The former column formulation — the parity reference. */
  private def legacy(text: org.apache.spark.sql.Column, n: Int) = {
    val w = split(text, " ")
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - lit(n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  test("native shingles equal the transform/slice/concat_ws formulation row-for-row") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val vocab = Vector("a", "bb", "ccc", "dd", "", "e f") // incl. empty token
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    } :+ ((999L, "")) :+ ((1000L, "   ")) // empty + all-empty-token texts
    val df = rows.toDF("id", "text")
    for (n <- Seq(2, 3, 8)) {
      val got = df.select(col("id"),
          graft.operators.DedupOps.shingles(col("text"), n).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val exp = df.select(col("id"), legacy(col("text"), n).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(got == exp, s"n=$n")
    }
  }

  test("null token array is NULL; short arrays are empty") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    assert(Shingles(Literal.create(null, ArrayType(StringType)), 3)
      .eval(null) == null)
    val one = new GenericArrayData(
      Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString("x")))
    val got = Shingles(Literal.create(one, ArrayType(StringType)), 3)
      .eval(null).asInstanceOf[ArrayData]
    assert(got.numElements() == 0)
  }
}
