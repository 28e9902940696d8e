package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class JoinOpsSpec extends AnyFunSuite {

  test("saltedJoin equals the plain inner join on a skewed key") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Hot key 1 carries 80% of the big side; keys 2..5 the rest; key 99
    // matches nothing (inner semantics).
    val big = ((1 to 400).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => ((i % 4 + 2).toLong, i.toLong)) ++
      Seq((99L, 0L))).toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "c2"), (3L, "c3"), (4L, "c4"),
      (5L, "c5"), (7L, "unmatched")).toDF("k", "tag")

    val plain = big.join(small, "k")
      .groupBy("k", "tag").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val salted = JoinOps.saltedJoin(big, small, "k", 7)
      .groupBy("k", "tag").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(salted == plain)
    assert(plain.exists { case (k, _, n, _) => k == 1L && n == 400L })
  }

  test("the hot key's rows actually spread across salt buckets") {
    val spark = TestSpark.spark
    import spark.implicits._
    val big = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "payload")
    val buckets = big.withColumn("_salt",
        pmod(xxhash64(col("k"), col("payload")), lit(8)).cast("int"))
      .groupBy("_salt").count().collect().map(_.getLong(1))
    assert(buckets.length == 8, s"expected all 8 buckets hit: ${buckets.length}")
    assert(buckets.max < 1000 / 2, s"salt failed to spread: max=${buckets.max}")
  }

  test("salt=1 degenerates to the plain join; bad salt rejected") {
    val spark = TestSpark.spark
    import spark.implicits._
    val big = Seq((1L, 10L), (2L, 20L)).toDF("k", "p")
    val small = Seq((1L, "x")).toDF("k", "t")
    assert(JoinOps.saltedJoin(big, small, "k", 1).count() == 1L)
    intercept[IllegalArgumentException] {
      JoinOps.saltedJoin(big, small, "k", 0)
    }
    intercept[IllegalArgumentException] {
      JoinOps.saltedJoin(big.withColumn("_salt", lit(1)), small, "k", 2)
    }
  }
}
