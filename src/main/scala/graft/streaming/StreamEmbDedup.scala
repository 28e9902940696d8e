package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EMBEDDING near-dup flagging — the ingestion-time twin of
  * [[graft.operators.VectorOps.cosNearDups]] / SemDeDup under
  * first-occurrence-kept semantics: every arriving vector is compared to
  * the KEPT representatives of its LSH bucket in the stream history, and
  * flagged `dup` iff its exact cosine to any of them is ≥ `minCos`. An
  * unflagged arrival becomes a representative itself (up to `cap` per
  * bucket) — exactly what an ingestion filter enforces: the first copy of
  * a semantic cluster streams through and seeds the keep-set, every later
  * near-copy is flagged for dropping.
  *
  * Blocking is ONE hyperplane table of `bits` sign bits (the
  * [[graft.operators.VectorOps.bucketCol]] family, same deterministic
  * planes as the batch operators): near-identical vectors share the
  * bucket with probability (1 − θ/π)^bits, so like the batch LSH
  * operators the detected set is the candidate subset — recall is the
  * blocking's, tunable via `bits` (fewer bits = bigger buckets = higher
  * recall at more comparisons); layer several independent runs for
  * multi-table recall. Dimension-mismatched or null vectors pass through
  * unflagged (they can be near nothing).
  *
  * State per bucket: at most `cap` (id, vector) representatives —
  * O(cap × dims) per occupied bucket, ≤ 2^bits buckets; evicted
  * `lateness` past the watermark (EventTimeTimeout). So state is bounded
  * by the hyperparameters and the value space, never by stream length —
  * the "runs forever" property of every twin here. A saturated bucket
  * stops admitting representatives (later distinct arrivals stream
  * through unflagged — the documented cap trade, mirroring
  * [[graft.operators.DedupOps.DefaultMaxBucket]]'s contract). Within one
  * batch, arrivals order by (ts, id) for deterministic replays.
  */
object StreamEmbDedup {

  /** One flagged row per arriving vector. */
  final case class EmbFlag(vec_id: Long, dup: Boolean)

  /** Internal row (public: generated deserializers must reach the
    * constructor — the Janino note on the sibling twins). */
  final case class EmbIn(bucket: Int, vecId: Long,
                         ts: java.sql.Timestamp, v: Array[Double])

  /** (idCol, tsCol, vecCol) stream → flagged stream (vec_id, dup).
    * Append mode. Also runs on a batch frame (state starts empty: pure
    * greedy first-occurrence flagging over the input). */
  def flagNearDups(embs: DataFrame, idCol: String, tsCol: String,
                   vecCol: String, bits: Int, dims: Int, minCos: Double,
                   cap: Int, lateness: String): Dataset[EmbFlag] = {
    require(bits >= 1 && bits <= 16, s"bits out of range: $bits")
    require(cap >= 1, s"cap must be >= 1: $cap")
    val spark = embs.sparkSession
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val rows = embs
      .select(col(idCol).cast("long").as("vecId"), col(tsCol).as("ts"),
        graft.operators.VectorOps.asDouble(col(vecCol)).as("v"))
      .withWatermark("ts", lateness)
      // A null or dimension-drifted vector nulls every plane dot, so all
      // its sign bits fall to the otherwise(0) arm and it lands in bucket
      // 0 — harmless: the per-row guards below flag it false and never
      // admit it to the keep-set.
      .select(
        graft.operators.VectorOps.bucketCol(col("v"), 0, bits, dims)
          .as("bucket"),
        col("vecId"), col("ts"), col("v"))
      .as[EmbIn]

    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dotAb = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dotAb += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0) 0.0 else dotAb / d
    }

    rows
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[List[(Long, Array[Double])], EmbFlag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Int, it: Iterator[EmbIn],
         state: GroupState[List[(Long, Array[Double])]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = it.toArray.sortBy(r => (r.ts.getTime, r.vecId))
            val kept0 = state.getOption.getOrElse(Nil)
            var kept = kept0
            val out = sorted.map { r =>
              val ok = r.v != null && r.v.length == dims
              val dup = ok &&
                kept.exists { case (_, kv) => cos(kv, r.v) >= minCos }
              if (ok && !dup && kept.size < cap)
                kept = (r.vecId, r.v) :: kept
              EmbFlag(r.vecId, dup)
            }
            // Write only when the keep-set grew (a per-batch put
            // otherwise — the sibling twins' state-write discipline).
            if (kept ne kept0) state.update(kept)
            try state.setTimeoutTimestamp(
              sorted.map(_.ts.getTime).max, lateness)
            catch { case _: UnsupportedOperationException |
                         _: IllegalArgumentException => () }
            out.iterator
          }
      }
  }
}
