package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.DedupOps

/** Streaming BOILERPLATE detection — the ingestion-time twin of
  * [[graft.operators.DedupOps.boilerplateCoverage]]: every arriving
  * document's k-token windows are checked against the stream history's
  * DISTINCT-DOCUMENT count for that window text, and an instance is
  * flagged `boiler` iff, counting its own document, the text has now been
  * seen in ≥ `minDocs` distinct documents. Self-repetition alone never
  * flags (one document is one document however often it stutters) — the
  * same doc-frequency semantics that separate the batch operator from
  * ExactSubstr coverage, under the only ordering an ingestion filter can
  * enforce: the first `minDocs − 1` documents' copies stream through, and
  * every instance from the threshold-crossing document onward flags.
  *
  * Parity with the batch operator (the relation the spec pins): a window
  * hash has a flagged instance here iff its batch document frequency is
  * ≥ `minDocs` (within the horizon), and per document the batch
  * `n_bp_windows` ≥ the stream's flagged count (all copies vs
  * from-the-crossing-on).
  *
  * State per span hash: the distinct doc ids seen, CAPPED at `minDocs`
  * (growth stops at the threshold — saturated spans carry exactly
  * `minDocs` ids forever), evicted `lateness` past the watermark
  * (EventTimeTimeout). So state is O(minDocs) per distinct span inside
  * the horizon — bounded by the span value space and the hyperparameter,
  * never by stream lifetime or corpus density. Within one batch,
  * instances order by (ts, doc id, position) for deterministic replays.
  */
object StreamBoilerplate {

  /** One flagged row per k-token window of each arriving document. */
  final case class SpanFlag(doc_id: Long, pos: Int, boiler: Boolean)

  /** Internal span row (public: the generated deserializer must reach the
    * constructor — a `private` nested case class fails Janino compilation
    * of the safe projection). `sh` is the raw 16-byte md5 digest — the
    * state-store group key carries these bytes for the whole watermark
    * horizon, so hex keys would double every key's footprint
    * ([[StreamSubstrDedup.SpanIn]]'s rationale, including its
    * checkpoint-incompatibility note: pre-change checkpoints cannot be
    * restored across the string→binary key change — guard with
    * [[StateCompat.guard]](dir, "boilerplate",
    * [[StateCompat.SpanKeyVersion]]), see UPGRADING.md). */
  final case class SpanIn(sh: Array[Byte], docId: Long,
                          ts: java.sql.Timestamp, pos: Int)

  /** (idCol, tsCol, text) stream → flagged window stream (doc_id, pos,
    * boiler). Append mode. Also runs on a batch frame (state starts
    * empty: pure prior-distinct-doc counting over the input). */
  def flagBoilerSpans(docs: DataFrame, idCol: String, tsCol: String,
                      k: Int, minDocs: Int, lateness: String): Dataset[SpanFlag] = {
    require(k >= 2 && k <= 1000, s"window width out of range: $k")
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
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
      .flatMapGroupsWithState[List[Long], SpanFlag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Array[Byte], rows: Iterator[SpanIn], state: GroupState[List[Long]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toArray
              .sortBy(r => (r.ts.getTime, r.docId, r.pos))
            val seen0 = state.getOption.getOrElse(Nil)
            var seen = seen0
            val out = sorted.map { r =>
              if (seen.size < minDocs && !seen.contains(r.docId))
                seen = r.docId :: seen
              SpanFlag(r.docId, r.pos, seen.size >= minDocs)
            }
            // Write only when the doc set actually grew: a saturated
            // span's list never changes again, and every update is a
            // state-store put replayed into the changelog per batch.
            if (seen ne seen0) state.update(seen)
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
