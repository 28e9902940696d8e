package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming conversion funnel — the stream-side twin of
  * [[graft.operators.EventOps.funnel]]: a per-user stage machine in
  * `mapGroupsWithState` that maintains the reach time of every funnel
  * stage and emits the user's current stage each trigger.
  *
  * Exactness contract: each micro-batch group is folded in ascending
  * event-time order, and with times ascending a stage's reach time is
  * FINAL the moment it is set (any event that could lower it is earlier
  * and already folded), so the incremental fold equals the batch
  * operator's chained-min semantics whenever each user's events arrive
  * in event-time order across triggers (always within one trigger). An
  * event arriving out of order across triggers that would have lowered
  * an already-used stage time is the documented lateness trade — same
  * posture as [[StreamDedup]]'s horizon.
  *
  * State per user is `|steps|` longs — constant, so the query runs
  * forever; keys partition by user, so scale is the shuffle of events to
  * their user partition and nothing else.
  */
object StreamFunnel {

  /** Per-user (user, stage, t_stage) updates for a (streaming or batch)
    * event frame; stage = number of leading funnel steps reached,
    * t_stage = reach time of the deepest reached stage (-1 when none).
    * Use update output mode. */
  def stageUpdates(events: DataFrame, userCol: String, usCol: String,
                   typeCol: String, steps: Seq[String])
      : Dataset[(Long, Int, Long)] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val n = steps.length
    val stepIdx = steps.zipWithIndex.tail
      .foldLeft(when(col(typeCol) === steps.head, 0)) {
        case (acc, (s, i)) => acc.when(col(typeCol) === s, i)
      }
    events
      .select(col(userCol).cast("long").as("u"),
        col(usCol).cast("long").as("us"), stepIdx.as("i"))
      .where(col("i").isNotNull)
      .as[(Long, Long, Int)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (u: Long, rows: Iterator[(Long, Long, Int)],
         state: GroupState[Seq[Long]]) =>
          val t = state.getOption.getOrElse(Seq.fill(n)(-1L)).toArray
          // Ascending (time, step) fold — see exactness contract above.
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, us, i) =>
            if (i == 0) {
              if (t(0) < 0 || us < t(0)) t(0) = us
            } else if (t(i - 1) >= 0 && us > t(i - 1) &&
                (t(i) < 0 || us < t(i))) {
              t(i) = us
            }
          }
          state.update(t.toSeq)
          val stage = t.indexWhere(_ < 0) match {
            case -1 => n
            case k  => k
          }
          (u, stage, if (stage == 0) -1L else t(stage - 1))
      }
  }
}
