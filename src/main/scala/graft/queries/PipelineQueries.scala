package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline queries over the `documents` / `embeddings` /
  * `events` tables (beyond the reference's own operator set — these are the
  * large-scale data-curation operators the north star asks for): exact and
  * fuzzy deduplication, similarity search, text analysis.
  *
  * Every query here is designed 100 TB-first: hash-bucketed joins (never
  * all-pairs), map-side partial aggregation, pure column expressions (no
  * per-row Scala UDFs), and DuckDB-expressible semantics for the oracle gate.
  */
object PipelineQueries {

  private[queries] def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private[queries] def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  private[queries] def events(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()

  val oracles: Map[String, String] = Map()
}
