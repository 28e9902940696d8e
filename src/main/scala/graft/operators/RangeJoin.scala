package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RANGE (interval) JOIN — all (left, right) pairs with the same key and
  * `right.ts ∈ [left.ts + lo, left.ts + hi]` (both bounds inclusive) — the
  * "events near events" temporal shape ([[AsofJoin]] is its latest-one-only
  * sibling).
  *
  * Spark plans a raw `l.key = r.key AND r.ts BETWEEN …` as an equi-join on
  * the key with the range as a post-filter — per-key work is the full
  * |L_key|×|R_key| product, quadratic on active keys. This is the standard
  * BUCKET-BLOCKED shape instead: time is cut into buckets of width
  * `hi − lo`, each left row replicates into the (at most TWO) buckets its
  * window can touch, right rows land in their own bucket, and the join is
  * an equi-join on (key, bucket) with the exact bounds as a residual
  * filter. Work is bounded by true temporal co-location (rows of the same
  * key in the same-or-adjacent window), never the per-key cross-product;
  * a time-bucket hot spot is a genuine burst, and AQE's skew-join split
  * handles it like any other skewed key.
  *
  * Timestamps are integers (µs epochs in this library); bucket ids use
  * exact floor division (`pmod`-corrected), so negative timestamps bucket
  * correctly. Output: every matching pair, as `left`'s columns plus
  * `payloadCols` from the matched right row (inner semantics — left rows
  * with no match are absent; aggregate afterwards for per-left counts).
  */
object RangeJoin {

  /** Exact floor division of a long column by a positive constant —
    * integer `DIV` truncates toward zero and would shift negative
    * timestamps into the wrong bucket. `a − pmod(a, w)` is an exact
    * multiple of `w`, so the quotient is exact (and the long cast
    * lossless) at any timestamp magnitude a µs epoch reaches. */
  private def fdiv(a: Column, w: Long): Column =
    ((a - pmod(a, lit(w))) / lit(w)).cast("long")

  def rangeJoin(left: DataFrame, right: DataFrame, keyCol: String,
                lTsCol: String, rTsCol: String, lo: Long, hi: Long,
                payloadCols: Seq[String]): DataFrame = {
    require(hi >= lo, s"empty range: lo=$lo hi=$hi")
    require(payloadCols.nonEmpty, "rangeJoin needs at least one payload column")
    require(payloadCols.forall(right.columns.contains),
      s"payload columns missing on right: ${payloadCols.filterNot(right.columns.contains)}")
    require(payloadCols.forall(c => !left.columns.contains(c)),
      s"payload columns collide with left: ${payloadCols.filter(left.columns.contains)}")
    val width = math.max(hi - lo, 1L)
    val leftCols = left.columns.toSeq
    // A window of span hi−lo overlaps at most two width-(hi−lo) buckets, so
    // the sequence below has 1-2 elements — bounded replication, not fanout.
    val l = left.withColumn("__bkt",
      explode(sequence(fdiv(col(lTsCol) + lo, width),
        fdiv(col(lTsCol) + hi, width))))
    val r = right
      .select((keyCol +: payloadCols).distinct.map(col) :+
        col(rTsCol).as("__rts"): _*)
      .withColumn("__bkt", fdiv(col("__rts"), width))
    l.join(r, Seq(keyCol, "__bkt"))
      .filter(col("__rts").between(col(lTsCol) + lo, col(lTsCol) + hi))
      .select(leftCols.map(col) ++ payloadCols.map(col): _*)
  }
}
