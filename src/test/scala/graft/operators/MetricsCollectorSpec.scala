package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** O24: emitted JSON records flatten to the reference collector's CSV
  * columns, with D3's Latency defaulting to 0 and points to "[]". */
class MetricsCollectorSpec extends AnyFunSuite {

  test("toRows flattens the emitted record into the collector layout") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rec = "{\"query_id\": \"7\", \"record_count\": 123, \"skyline_size\": 4, " +
      "\"optimality\": 0.2500, \"ingestion_time_ms\": 1, " +
      "\"local_processing_time_ms\": 2, \"global_processing_time_ms\": 3, " +
      "\"total_processing_time_ms\": 6}"
    val row = MetricsCollector.toRows(Seq(rec).toDF("value")).head()
    assert(row.getAs[String]("QueryID") == "7")
    assert(row.getAs[String]("Records") == "123")
    assert(row.getAs[Long]("SkylineSize") == 4L)
    assert(row.getAs[Double]("Optimality") == 0.25)
    assert(row.getAs[Long]("TotalTime(ms)") == 6L)
    assert(row.getAs[Long]("Latency(ms)") == 0L, "D3: latency absent => 0")
    assert(row.getAs[String]("SkylinePoints") == "[]")
  }

  test("appendBatch accumulates across appends") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_metrics").toString + "/out"
    val rec = "{\"query_id\": \"1\", \"record_count\": 1, \"skyline_size\": 1, " +
      "\"optimality\": 1.0000, \"ingestion_time_ms\": 0, " +
      "\"local_processing_time_ms\": 0, \"global_processing_time_ms\": 0, " +
      "\"total_processing_time_ms\": 0}"
    MetricsCollector.appendBatch(Seq(rec).toDF("value"), dir)
    MetricsCollector.appendBatch(Seq(rec).toDF("value"), dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == 2)
    assert(back.columns.contains("QueryID") && back.columns.contains("Latency(ms)"))
  }
}
