package graft.core

import scala.collection.mutable.ArrayBuffer

/** Skyline (Pareto frontier / maximal vector) kernels.
  *
  * Two algorithms:
  *
  *   - [[skylineOf]] — sort-filter-skyline (SFS, Chomicki et al., ICDE'03):
  *     sort by coordinate sum ascending, then a single forward pass. Because
  *     domination implies a strictly smaller coordinate sum, a candidate can
  *     only be dominated by an already-accepted point, so accepted points are
  *     never evicted. O(n log n + n·s·d) with s = skyline size. Used for
  *     batch compaction inside the aggregation buffer.
  *
  *   - [[insert]] — incremental block-nested-loop (BNL) insert, the
  *     reference's streaming-state update (reference:
  *     `java/org.main/FlinkSkyline.java:417-444`): drop a dominated
  *     candidate, evict incumbents the candidate dominates, else append.
  *     Used by the streaming state function where points arrive one at a
  *     time.
  *
  * Both preserve duplicates of skyline points (equal vectors never dominate —
  * SURVEY §1.2) and are insensitive to input order in their final result.
  */
object SkylineKernel {

  /** Exact skyline of a batch of points via SFS. Output order is
    * sum-ascending (callers that care about order must sort themselves; the
    * skyline is a multiset).
    */
  def skylineOf(points: ArrayBuffer[Array[Double]]): ArrayBuffer[Array[Double]] = {
    if (points.length <= 1) return points.clone()
    val sorted = points.sortBy(Dominance.coordSum)
    val acc = new ArrayBuffer[Array[Double]](math.min(64, sorted.length))
    var i = 0
    while (i < sorted.length) {
      val p = sorted(i)
      var dominated = false
      var j = 0
      while (j < acc.length && !dominated) {
        if (Dominance.dominates(acc(j), p)) dominated = true
        j += 1
      }
      if (!dominated) acc += p
      i += 1
    }
    acc
  }

  /** Incremental BNL insert of `p` into skyline `buf` (mutated in place).
    * Returns true iff `p` survived (was appended).
    */
  def insert(buf: ArrayBuffer[Array[Double]], p: Array[Double]): Boolean = {
    var i = 0
    while (i < buf.length) {
      if (Dominance.dominates(buf(i), p)) return false
      i += 1
    }
    // p survives: evict incumbents it dominates
    var w = 0
    i = 0
    while (i < buf.length) {
      if (!Dominance.dominates(p, buf(i))) {
        if (w != i) buf(w) = buf(i)
        w += 1
      }
      i += 1
    }
    buf.dropRightInPlace(buf.length - w)
    buf += p
    true
  }

  /** Merge two skylines (the aggregate `merge` phase). Concatenate + SFS —
    * exact for arbitrary inputs, not just valid skylines.
    */
  def merge(a: ArrayBuffer[Array[Double]], b: ArrayBuffer[Array[Double]]): ArrayBuffer[Array[Double]] =
    skylineOf(a ++ b)
}

/** Mutable aggregation buffer for the skyline aggregate function.
  *
  * Accumulates raw points and compacts to the running skyline once the
  * buffer doubles past the last compaction result (amortized O(log) compaction
  * passes, each SFS). This keeps per-row `reduce` cost at an append while
  * bounding memory at O(2·s + threshold).
  *
  * Serialized by Kryo only at the partial→final shuffle boundary (Spark keeps
  * aggregation buffers as live objects within a partition). The Aggregator
  * API has no pre-serialization hook, so the shuffled payload is bounded by
  * `compactAt` (≈ 2·s + [[SkyBuffer.MinCompact]] points), not exactly the
  * local skyline; `merge` re-runs SFS either way, mirroring the reference's
  * MR local-phase output (`FlinkSkyline.java:396-403`).
  */
final class SkyBuffer(
    var points: ArrayBuffer[Array[Double]],
    var compactAt: Int
) extends Serializable {
  def this() = this(new ArrayBuffer[Array[Double]], SkyBuffer.MinCompact)

  def add(p: Array[Double]): Unit = {
    points += p
    if (points.length >= compactAt) compact()
  }

  def absorb(other: SkyBuffer): Unit = {
    points ++= other.points
    compact()
  }

  def compact(): Unit = {
    points = SkylineKernel.skylineOf(points)
    compactAt = math.max(SkyBuffer.MinCompact, 2 * points.length)
  }

  /** Final skyline as an array (the aggregate `finish`/`eval`). */
  def result(): Array[Array[Double]] = {
    compact()
    points.toArray
  }
}

object SkyBuffer {
  /** Minimum points between compactions; amortizes SFS sort cost. */
  val MinCompact = 1024
}
