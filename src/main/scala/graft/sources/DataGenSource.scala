package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.DataGen

/** DataFrame surface over [[graft.core.DataGen]] (reference O22 — the three
  * QoS distributions of `python/unified_producer.py:50-123`).
  *
  * Because each record is a pure function of `(seed, id)`, generation
  * distributes trivially: `spark.range` splits the id space across
  * executors and every partition generates independently — no sequential
  * RNG stream to replay, identical output under any partitioning. This is
  * the property that lets the same generator drive a 1000-executor fixture
  * load and a single-threaded unit test to byte-identical data.
  */
object DataGenSource {

  /** `n` points of `method` ∈ {uniform, correlated, anti_correlated} as
    * (id: long, values: array<double>). */
  def pointsDF(spark: SparkSession, method: String, seed: Long, n: Long,
               dims: Int, dMin: Int, dMax: Int, numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val ids = if (numPartitions > 0) spark.range(0L, n, 1L, numPartitions)
              else spark.range(n)
    ids.map(id => (id, DataGen.generate(method, seed, id, dims, dMin, dMax)))
      .toDF("id", "values")
  }
}
