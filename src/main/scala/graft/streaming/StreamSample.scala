package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.operators.CorpusOps

/** Streaming weighted sample — the stream-side twin of
  * [[graft.operators.CorpusOps.prioritySample]]: priority sampling
  * (weight / deterministic-hash draw) maintained incrementally over an
  * unbounded feed. Each shard keeps its running top-k by priority in
  * `mapGroupsWithState` and emits it every trigger.
  *
  * The priority expression is the SAME column recipe as the batch
  * operator (w / [[CorpusOps.hashDrawCol]]), so batch and stream cannot
  * drift: the union of shard top-ks is a SUPERSET of the global top-k
  * (each shard's top-k contains every one of its global-top-k members),
  * and a final take-k over the emitted union — k·nShards rows, driver
  * scale — reproduces the batch sample exactly. That is the same
  * candidates-then-finalize contract as [[StreamHeavyHitters]].
  *
  * State is bounded at k entries per shard regardless of stream length —
  * the sample IS the state — so the query runs forever on an unbounded
  * feed. */
object StreamSample {

  /** Per-shard running weighted-sample candidates for a (streaming or
    * batch) documents frame. Output rows: (shard, doc id, w, prio); use
    * update output mode. */
  def priorityCandidates(docs: DataFrame, idCol: String, k: Int,
                         nShards: Int, salt: String = "prio:")
      : Dataset[(Int, Long, Long, Double)] = {
    require(k >= 1 && nShards >= 1, s"need k, nShards >= 1: $k, $nShards")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        pmod(hash(col(idCol)), lit(nShards)).as("shard"),
        col(idCol).cast("long").as("id"),
        col("n_chars").cast("long").as("w"),
        (col("n_chars").cast("double") /
          CorpusOps.hashDrawCol(col("text"), salt).cast("double")).as("prio"))
      .as[(Int, Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[(Int, Long, Long, Double)],
         state: GroupState[Seq[(Double, Long, Long)]]) =>
          val merged = (state.getOption.getOrElse(Seq.empty) ++
              rows.map(r => (r._4, r._2, r._3)))
            .sortBy { case (p, id, _) => (-p, id) }
            .take(k)
          state.update(merged)
          shard -> merged
      }
      .flatMap { case (shard, s) =>
        s.map { case (p, id, w) => (shard, id, w, p) }
      }
  }
}
