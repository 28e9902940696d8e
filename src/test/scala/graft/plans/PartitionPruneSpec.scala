package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

import graft.TestSpark

/** Hive-style partitioned layout: writing partitioned by a predicate
  * column turns equality filters into PARTITION pruning — directories
  * never listed into the scan, the coarsest and cheapest skip a 100 TB
  * reader has (before row-group stats even load). Pinned as a plan
  * property: the partition filter binds, and the scan's selected
  * partition count is exactly 1 of 5. */
class PartitionPruneSpec extends AnyFunSuite {

  test("equality filter on the partition column prunes to one directory") {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft-part")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .write.partitionBy("lang").parquet(s"$dir/docs")
    val df = spark.read.parquet(s"$dir/docs")
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("n_chars"))
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.length == 1)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"partition filter did not bind: ${scan.metadata}")
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 of 5 lang partitions, read ${scan.selectedPartitions.partitionCount}")
    // And the result is still the right rows.
    val expected = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("lang") === "en").count()
    assert(df.count() == expected)
  }
}
