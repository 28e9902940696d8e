package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import graft.core.SkyBuffer

/** `skyline_agg(values: array<double>) -> array<array<double>>` — the
  * engine's centerpiece aggregate.
  *
  * Implemented as a typed [[Aggregator]] so Spark's partial aggregation gives
  * the two-phase MR-skyline structure natively (SURVEY §4): `reduce` runs
  * map-side per input partition (the reference's local BNL phase,
  * reference: `java/org.main/FlinkSkyline.java:417-444`), only the compacted
  * local skylines cross the shuffle, and `merge` reproduces the global BNL
  * merge (`FlinkSkyline.java:546-566`). At cluster scale this ships O(local
  * skyline) bytes per partition instead of O(data) — the whole point of the
  * MR-skyline design — and Spark's ObjectHashAggregate handles spill.
  *
  * Buffers are live JVM objects within a task; Kryo serialization happens
  * only at the shuffle boundary. The shipped buffer is bounded by
  * `compactAt` (≈ 2·s + 1024 points — the Aggregator API has no
  * pre-serialization compaction hook), and `merge` re-runs SFS after the
  * shuffle.
  */
class SkylineAgg extends Aggregator[Array[Double], SkyBuffer, Array[Array[Double]]] {
  override def zero: SkyBuffer = new SkyBuffer()

  override def reduce(b: SkyBuffer, a: Array[Double]): SkyBuffer = {
    if (a != null) b.add(a)
    b
  }

  override def merge(b1: SkyBuffer, b2: SkyBuffer): SkyBuffer = {
    b1.absorb(b2)
    b1
  }

  override def finish(b: SkyBuffer): Array[Array[Double]] = b.result()

  override def bufferEncoder: Encoder[SkyBuffer] = Encoders.kryo[SkyBuffer]

  // ExpressionEncoder is a catalyst-internal API (no public encoder exists
  // for array<array<double>>); pinned to the Spark 4.x line in build.sbt —
  // revisit on a Spark major upgrade.
  override def outputEncoder: Encoder[Array[Array[Double]]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Array[Double]]]()
}

object SkylineAgg {
  private lazy val fn = udaf(new SkylineAgg)

  /** Column form: `skyline_agg($"values")`. */
  def skyline_agg(values: Column): Column = fn(values)
}
