package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.TestSpark

/** Bucketed-layout co-location: writing both join sides bucketed+sorted on
  * the join key lets the sort-merge join (AND the downstream keyed
  * aggregation) plan with ZERO shuffle exchanges — the storage-layout
  * contract a 100 TB fact⋈fact pipeline relies on (pay the shuffle once at
  * write time, never again per query). The spec pins the plan property
  * (no ShuffleExchange anywhere) and the result equality against the
  * plain unbucketed join. */
class BucketJoinSpec extends AnyFunSuite {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val spark = TestSpark.spark
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed join + keyed agg plan with zero shuffle exchanges") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-buckets")
    val t1 = (1 to 20000).map(i => (i.toLong % 512, i.toLong)).toDF("k", "a")
    val t2 = (1 to 20000).map(i => (i.toLong % 512, i.toLong * 2)).toDF("k", "b")
    spark.sql("DROP TABLE IF EXISTS graft_b1")
    spark.sql("DROP TABLE IF EXISTS graft_b2")
    t1.write.bucketBy(16, "k").sortBy("k")
      .option("path", s"$dir/b1").saveAsTable("graft_b1")
    t2.write.bucketBy(16, "k").sortBy("k")
      .option("path", s"$dir/b2").saveAsTable("graft_b2")
    try {
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
               "spark.sql.adaptive.enabled" -> "false") {
        val j = spark.table("graft_b1").join(spark.table("graft_b2"), "k")
          .groupBy("k").agg(sum("a").as("sa"), sum("b").as("sb"))
        val exchanges = j.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }
        assert(exchanges.isEmpty,
          s"bucketed join still shuffles:\n${j.queryExecution.executedPlan}")
        // Same rows as the layout-oblivious plan.
        val plain = t1.join(t2, "k")
          .groupBy("k").agg(sum("a").as("sa"), sum("b").as("sb"))
        assert(j.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSet ==
          plain.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
            .toSet)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_b1")
      spark.sql("DROP TABLE IF EXISTS graft_b2")
    }
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-buckets2")
    val t1 = (1 to 1000).map(i => (i.toLong % 64, i.toLong)).toDF("k", "a")
    val t2 = (1 to 1000).map(i => (i.toLong % 64, i.toLong * 3)).toDF("k", "b")
    spark.sql("DROP TABLE IF EXISTS graft_c1")
    spark.sql("DROP TABLE IF EXISTS graft_c2")
    t1.write.bucketBy(8, "k").option("path", s"$dir/c1").saveAsTable("graft_c1")
    t2.write.bucketBy(4, "k").option("path", s"$dir/c2").saveAsTable("graft_c2")
    try {
      val j = spark.table("graft_c1").join(spark.table("graft_c2"), "k")
      assert(j.count() == t1.join(t2, "k").count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_c1")
      spark.sql("DROP TABLE IF EXISTS graft_c2")
    }
  }
}
