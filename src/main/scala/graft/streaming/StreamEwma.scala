package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EWMA rate monitor — the stream-side twin of
  * [[graft.operators.EventOps.ewmaDaily]]: per-group state holds the last
  * `w` daily counts (the truncated-window buffer), each arriving day emits
  * the identical scaled EWMA numerator
  *
  *   ewma_num(d) = Σ_{j=0}^{w−1} x(d−j) · 7ʲ · 8^{w−1−j},
  *
  * and days skipped between consecutive arrivals are zero-filled and
  * emitted too — so the emission series IS the batch
  * `ewmaDaily(dailyFill(…))` row set, numerator for numerator (the parity
  * spec pins this across triggers).
  *
  * Exactness contract: like [[StreamFunnel]], per-group arrivals must be
  * day-ascending (a finalized-daily-count feed — e.g. the output of a
  * watermarked daily aggregation — is ascending by construction); a row at
  * or before the group's last seen day is dropped, not merged. State per
  * group is ≤ w longs + one day cursor — constant, unbounded-runtime safe.
  */
object StreamEwma {

  /** Per-group (grp, day, n) finalized daily counts → (grp, day, n,
    * ewma_num) updates, gap days zero-filled. Use update output mode. */
  def ewmaUpdates(daily: DataFrame, grpCol: String, dayCol: String,
                  valCol: String, w: Int = 14)
      : Dataset[(String, Long, Long, Long)] = {
    require(w >= 1 && w <= 20, s"window out of range: $w")
    val weights = Array.tabulate(w)(j =>
      (BigInt(7).pow(j) * BigInt(8).pow(w - 1 - j)).toLong)
    val spark = daily.sparkSession
    import spark.implicits._
    daily
      .select(col(grpCol).cast("string"), col(dayCol).cast("long"),
        col(valCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[(Long, List[Long])]) =>
          // recent(0) = count at lastDay, recent(1) = day before, …
          var (lastDay, recent) =
            state.getOption.getOrElse((Long.MinValue, List.empty[Long]))
          val out = Seq.newBuilder[(String, Long, Long, Long)]
          def push(day: Long, n: Long): Unit = {
            recent = (n :: recent).take(w)
            lastDay = day
            val num = recent.iterator.zipWithIndex
              .map { case (x, j) => x * weights(j) }.sum
            out += ((g, day, n, num))
          }
          rows.toSeq.sortBy(_._2).foreach { case (_, day, n) =>
            if (lastDay == Long.MinValue) push(day, n)
            else if (day > lastDay) {
              var gap = lastDay + 1
              while (gap < day) { push(gap, 0L); gap += 1 }
              push(day, n)
            } // day <= lastDay: stale, dropped (in-order feed contract)
          }
          state.update((lastDay, recent))
          out.result().iterator
      }
  }

  /** Streaming 3σ spike detector — the stream-side twin of
    * [[graft.operators.EventOps.spikeDays]]: per-group state holds the
    * trailing `w` daily counts, each arriving (or zero-filled gap) day is
    * judged against its PRECEDING w days with the identical
    * cross-multiplied integer test (w·x − S)² > 9·(w·Q − S²), upward and
    * full-history only. Emission series == the batch
    * `spikeDays(dailyFill(…))` flag column row for row (parity spec).
    * Same in-order contract and ≤ w-long state as [[ewmaUpdates]]. */
  def spikeUpdates(daily: DataFrame, grpCol: String, dayCol: String,
                   valCol: String, w: Int = 7)
      : Dataset[(String, Long, Long, Long)] = {
    require(w >= 2, s"window out of range: $w")
    val spark = daily.sparkSession
    import spark.implicits._
    daily
      .select(col(grpCol).cast("string"), col(dayCol).cast("long"),
        col(valCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[(Long, List[Long])]) =>
          var (lastDay, recent) =
            state.getOption.getOrElse((Long.MinValue, List.empty[Long]))
          val out = Seq.newBuilder[(String, Long, Long, Long)]
          def push(day: Long, n: Long): Unit = {
            val flag =
              if (recent.length < w) 0L
              else {
                val s = recent.sum
                val q = recent.iterator.map(x => x * x).sum
                if (n * w > s &&
                  (n * w - s) * (n * w - s) > 9L * (q * w - s * s)) 1L
                else 0L
              }
            recent = (n :: recent).take(w)
            lastDay = day
            out += ((g, day, n, flag))
          }
          rows.toSeq.sortBy(_._2).foreach { case (_, day, n) =>
            if (lastDay == Long.MinValue) push(day, n)
            else if (day > lastDay) {
              var gap = lastDay + 1
              while (gap < day) { push(gap, 0L); gap += 1 }
              push(day, n)
            }
          }
          state.update((lastDay, recent))
          out.result().iterator
      }
  }
}
