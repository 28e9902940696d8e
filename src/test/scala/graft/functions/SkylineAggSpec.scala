package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.core.SkylineKernel
import graft.functions.SkylineAgg.skyline_agg
import graft.operators.SkylineOps

/** End-to-end Spark coverage of the UDAF wiring (ADVICE.md #1): Kryo buffer
  * encoder, internal ExpressionEncoder output, and partial/merge across a
  * real multi-partition shuffle, against the in-repo brute-force kernel.
  */
class SkylineAggSpec extends AnyFunSuite {

  private def multiset(points: Seq[Seq[Double]]): Map[Seq[Double], Int] =
    points.groupBy(identity).view.mapValues(_.size).toMap

  test("skyline_agg over 8 partitions equals the kernel oracle, duplicates retained") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // small integer domain guarantees duplicate vectors, incl. on the frontier
    val pts = Seq.fill(5000)(Array.fill(3)(rnd.nextInt(12).toDouble))
    val df = pts.map(p => Tuple1(p)).toDF("values").repartition(8)

    val got = df.agg(skyline_agg(col("values")).as("sky"))
      .select(explode(col("sky")).as("p"))
      .as[Array[Double]].collect().toSeq.map(_.toSeq)

    val expect = SkylineKernel.skylineOf(ArrayBuffer(pts: _*)).toSeq.map(_.toSeq)

    assert(multiset(got) == multiset(expect))
    assert(expect.groupBy(identity).exists(_._2.size > 1),
      "fixture should contain duplicated frontier vectors")
  }

  test("skylineRows preserves input duplicate multiplicity") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = Seq((1.0, 5.0), (1.0, 5.0), (1.0, 5.0), (5.0, 1.0), (9.0, 9.0))
    val df = rows.toDF("x", "y").repartition(4)
    val sky = SkylineOps.skylineRows(df, Seq("x", "y")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(sky.count(_ == ((1.0, 5.0))) == 3)
    assert(sky.count(_ == ((5.0, 1.0))) == 1)
    assert(!sky.contains((9.0, 9.0)))
  }
}
