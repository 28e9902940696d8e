package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.DedupOps

/** Streaming SUB-DOCUMENT dedup — the ingestion-time twin of
  * [[graft.operators.DedupOps.duplicatedSpanCoverage]]: every arriving
  * document's k-token windows are checked against the stream HISTORY, and
  * each window is flagged `dup` iff its exact text was already seen (in an
  * earlier batch, earlier in this batch, or earlier in the same document) —
  * the Lee et al. ExactSubstr rule under first-occurrence-kept semantics,
  * which is what an ingestion filter actually enforces: the first copy of a
  * boilerplate span streams through, every later copy is flagged for
  * trimming.
  *
  * Semantics vs the batch operator (same relationship as [[StreamDedup]] to
  * `dedupExact`): batch marks ALL copies of a duplicated window (global
  * count ≥ 2); the stream marks all-but-first. The two agree on WHICH
  * window texts are duplicated — a hash has a flagged instance here iff it
  * has count ≥ 2 there (the parity the spec pins) — and on the flagged set
  * for any document arriving after its duplicate source.
  *
  * State is one boolean per span hash, evicted `lateness` past the
  * watermark (EventTimeTimeout) — bounded by the distinct spans inside the
  * horizon, not by stream lifetime, the property that lets this run forever
  * on an unbounded feed. A span recurring later than the horizon is treated
  * as new (the documented bounded-state trade; global-history dedup is the
  * batch operator's job). Within one batch, instances order by (ts, doc id,
  * position), so replays are deterministic.
  */
object StreamSubstrDedup {

  /** One flagged row per k-token window of each arriving document. */
  final case class SpanFlag(doc_id: Long, pos: Int, dup: Boolean)

  /** Internal span row (public: the generated deserializer must reach the
    * constructor — a `private` nested case class fails Janino compilation
    * of the safe projection). `sh` is the RAW 16-byte md5 digest
    * (`unhex(md5(...))`), not the 32-char hex string — the state-store
    * group key carries these bytes for the whole watermark horizon, so
    * hex keys would double every key's footprint for the same identity
    * (the batch span table made the same move; grouping compares the
    * ENCODED key bytes, so a binary key groups correctly). NOTE: this is
    * a state-SCHEMA change — a checkpoint written by the earlier
    * hex-string-keyed build cannot be restored (the state compatibility
    * checker rejects string→binary keys); restart such queries fresh.
    * Guard checkpoints with [[StateCompat.guard]](dir, "substr",
    * [[StateCompat.SpanKeyVersion]]) to turn the opaque mid-batch schema
    * error into an immediate named failure — see UPGRADING.md. */
  final case class SpanIn(sh: Array[Byte], docId: Long,
                          ts: java.sql.Timestamp, pos: Int)

  /** (idCol, tsCol, text) stream → flagged window stream (doc_id, pos,
    * dup). Append mode. Also runs on a batch frame (state starts empty:
    * pure earlier-occurrence flagging over the input). */
  def flagDupSpans(docs: DataFrame, idCol: String, tsCol: String,
                   k: Int, lateness: String): Dataset[SpanFlag] = {
    require(k >= 2 && k <= 1000, s"window width out of range: $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val spans = graft.plans.GraftFunctions.on(docs)
      .select(col(idCol).cast("long").as("docId"), col(tsCol).as("ts"),
        posexplode(DedupOps.shingles(col("text"), k)))
      .withWatermark("ts", lateness)
      .select(unhex(md5(col("col"))).as("sh"), col("docId"), col("ts"),
        col("pos").cast("int"))
      .as[SpanIn]
    spans
      .groupByKey(_.sh)
      .flatMapGroupsWithState[Boolean, SpanFlag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Array[Byte], rows: Iterator[SpanIn], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toArray
              .sortBy(r => (r.ts.getTime, r.docId, r.pos))
            val seen0 = state.getOption.getOrElse(false)
            var seen = seen0
            val out = sorted.map { r =>
              val dup = seen
              seen = true
              SpanFlag(r.docId, r.pos, dup)
            }
            // Write the value only on the first sighting: every update is
            // a state-store put replayed into the changelog/delta per
            // batch, and `true` never changes once set. The timeout
            // refresh below is the write that MUST happen per batch (it
            // extends the eviction horizon past this sighting).
            if (!seen0) state.update(true)
            // Evict once the watermark passes the last sighting + horizon.
            // Batch execution drops the watermark node and rejects timeout
            // timestamps (UnsupportedOperation / IllegalArgument depending
            // on path) — state dies with the job there anyway.
            try state.setTimeoutTimestamp(
              sorted.map(_.ts.getTime).max, lateness)
            catch { case _: UnsupportedOperationException |
                         _: IllegalArgumentException => () }
            out.iterator
          }
      }
  }
}
