package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.operators.CorpusOps

/** Streaming heavy-hitter candidates — the stream-side twin of
  * [[graft.operators.CorpusOps.heavyHitters]]: each shard keeps a
  * Misra–Gries sketch in `mapGroupsWithState` (driven by the SAME pure
  * `reduce` as the batch `MgSketchAgg`, so batch and stream cannot drift)
  * and emits its current candidate set with working counts every trigger.
  *
  * State is bounded at `cap` counters per shard regardless of stream
  * length — the sketch IS the state, so the query runs forever on an
  * unbounded feed. The MG no-miss guarantee composes: any value with
  * frequency > N_shard/(cap+1) within its shard is among that shard's
  * candidates, so a periodic batch recount over the emitted union (the
  * two-pass scheme) stays exact. Working counts are sketch counts
  * (underestimates), not exact — consumers rank by them, then recount.
  */
object StreamHeavyHitters {

  /** Per-shard MG candidate sets for a (streaming or batch) values frame.
    * Output rows: (shard, value, sketchCount); use update output mode. */
  def topCandidates(values: DataFrame, valCol: String, nShards: Int,
                    cap: Int): Dataset[(Int, String, Long)] = {
    val spark = values.sparkSession
    import spark.implicits._
    val agg = new CorpusOps.MgSketchAgg(cap)
    values.select(col(valCol).cast("string").as("v"),
        pmod(hash(col(valCol)), lit(nShards)).as("shard"))
      .as[(String, Int)]
      .groupByKey(_._2)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[(String, Int)],
         state: GroupState[Map[String, Long]]) =>
          val st = rows.foldLeft(
            state.getOption.getOrElse(Map.empty[String, Long])) {
            (b, r) => agg.reduce(b, r._1)
          }
          state.update(st)
          shard -> st
      }
      .flatMap { case (shard, m) =>
        m.toSeq.map { case (v, c) => (shard, v, c) }
      }
  }
}
