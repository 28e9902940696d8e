package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Streaming exact deduplication — the stream-side twin of
  * [[graft.operators.TextOps.dedupExact]]: the first document bearing each
  * normalized-text hash passes, later re-occurrences within the watermark
  * horizon are dropped.
  *
  * Uses `dropDuplicatesWithinWatermark`, so dedup state is BOUNDED: a hash
  * is only remembered for the lateness window, then evicted — the property
  * that lets the operator run forever on an unbounded 100 TB/day feed
  * (plain streaming `dropDuplicates` retains every key it has ever seen).
  * The trade is explicit and documented: a duplicate arriving later than
  * `lateness` after its original is treated as new; exact global dedup over
  * all time is the batch operator's job.
  */
object StreamDedup {

  /** First-within-horizon rows of `docs` keyed by normalized text hash.
    * Works on a streaming or batch DataFrame (batch: plain dropDuplicates
    * semantics over the whole input). */
  def dedupExactStream(docs: DataFrame, tsCol: String, lateness: String): DataFrame =
    docs
      .withColumn("graft_h", TextOps.normHashCol(col("text")))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("graft_h")
      .drop("graft_h")
}
