package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the unbounded-feed twin of
  * [[graft.operators.RangeJoin]]: all same-key pairs with
  * `right.ts ∈ [left.ts + loSec, left.ts + hiSec]` (inclusive, seconds).
  *
  * Uses Spark's native stream-stream join machinery: both inputs are
  * watermarked and the range condition is written in the canonical
  * two-bound interval form, which is exactly what the engine needs to
  * derive state watermarks — each side's join state is evicted once the
  * other side's watermark passes the window, so state is bounded by rows
  * within (range span + lateness), never the stream history. Inner
  * semantics: matches emit as soon as both rows have arrived.
  *
  * The same call works on BATCH frames (`withWatermark` is a no-op and the
  * join is a plain range join), which is how the spec pins it to the
  * bucket-blocked batch operator's output — batch/stream parity, like
  * [[EventWindows]].
  *
  * Output columns: left's columns then right's (caller projects; key and
  * timestamp columns must be distinct names across the two sides).
  */
object StreamRangeJoin {

  private def shift(ts: Column, secs: Long): Column =
    if (secs >= 0) ts + expr(s"INTERVAL '$secs' SECOND")
    else ts - expr(s"INTERVAL '${-secs}' SECOND")

  def intervalJoinStream(left: DataFrame, right: DataFrame,
                         lKeyCol: String, rKeyCol: String,
                         lTsCol: String, rTsCol: String,
                         loSec: Long, hiSec: Long,
                         lateness: String): DataFrame = {
    require(hiSec >= loSec, s"empty range: lo=$loSec hi=$hiSec")
    require(lKeyCol != rKeyCol && lTsCol != rTsCol,
      "left/right key and timestamp column names must differ (both survive the join)")
    val l = left.withWatermark(lTsCol, lateness)
    val r = right.withWatermark(rTsCol, lateness)
    l.join(r,
      col(lKeyCol) === col(rKeyCol) &&
        col(rTsCol) >= shift(col(lTsCol), loSec) &&
        col(rTsCol) <= shift(col(lTsCol), hiSec))
  }
}
