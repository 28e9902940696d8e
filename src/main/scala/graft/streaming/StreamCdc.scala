package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming CDC upsert compaction — the stream-side twin of
  * [[graft.operators.CdcOps.latestSnapshot]]: per-key state holds the
  * (seq, tie) maximum seen so far with its attribute value, and each
  * trigger emits the key's current state (update output mode) — a
  * continuously-maintained MERGE target.
  *
  * Exactness contract: max is order-insensitive and commutative, so unlike
  * [[StreamFunnel]] no per-batch ordering or cross-trigger arrival
  * assumption is needed — the final emission per key equals the batch
  * snapshot under ANY arrival order (the parity spec shuffles across
  * triggers to pin exactly this). State per key is two longs + the
  * attribute value — constant, unbounded-runtime safe; scale is the
  * key-partition shuffle, same as the batch operator's window exchange.
  */
object StreamCdc {

  /** Per-key (key, seq, tie, value) latest-state updates for a streaming or
    * batch changelog. Use update output mode. */
  def latestUpdates(changelog: DataFrame, keyCol: String, seqCol: String,
                    tieCol: String, valCol: String)
      : Dataset[(Long, Long, Long, String)] = {
    val spark = changelog.sparkSession
    import spark.implicits._
    changelog
      .select(col(keyCol).cast("long"), col(seqCol).cast("long"),
        col(tieCol).cast("long"), col(valCol).cast("string"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (k: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[(Long, Long, String)]) =>
          val best = rows.foldLeft(
            state.getOption.getOrElse((Long.MinValue, Long.MinValue, null: String))) {
            (b, r) =>
              if (r._2 > b._1 || (r._2 == b._1 && r._3 > b._2)) (r._2, r._3, r._4)
              else b
          }
          state.update(best)
          (k, best._1, best._2, best._3)
      }
  }
}
