package graft.core

import java.util.Random

/** The reference's three synthetic QoS distributions
  * (reference: `python/unified_producer.py:50-123`), re-expressed as pure
  * functions of `(seed, recordId)` so generation is deterministic under ANY
  * partitioning of the id range — the property a distributed generator needs
  * (the Python original is a single sequential RNG stream).
  *
  * Values are integer-clamped to `[dMin, dMax]` like the reference:
  * truncation toward zero matches Python `int()` for all inputs (correlated
  * noise and anti-correlated scaling can go negative mid-computation), and
  * the subsequent clamp bounds the result to the domain either way.
  */
object DataGen {

  /** SplitMix64-style per-record seed: decorrelates consecutive ids. */
  private def mix(seed: Long, id: Long): Long = {
    var z = seed ^ (id * 0x9E3779B97F4A7C15L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def rng(seed: Long, id: Long): Random = new Random(mix(seed, id))

  private def clampInt(v: Double, dMin: Int, dMax: Int): Double =
    math.max(dMin.toDouble, math.min(dMax.toDouble, v.toInt.toDouble))

  /** Each dimension i.i.d. uniform integer in [dMin, dMax].
    * (reference: `unified_producer.py:50-51`)
    */
  def uniform(seed: Long, id: Long, dims: Int, dMin: Int, dMax: Int): Array[Double] = {
    val r = rng(seed, id)
    Array.fill(dims)((dMin + r.nextInt(dMax - dMin + 1)).toDouble)
  }

  /** Positively correlated: base ~ U(dMin,dMax); each dim = base + noise,
    * noise ~ U(±(1−rho)·range); int-clamped. rho defaults to 0.9 like the
    * reference. (reference: `unified_producer.py:63-76`)
    */
  def correlated(seed: Long, id: Long, dims: Int, dMin: Int, dMax: Int, rho: Double = 0.9): Array[Double] = {
    val r = rng(seed, id)
    val range = (dMax - dMin).toDouble
    val base = dMin + r.nextDouble() * range
    Array.fill(dims) {
      val noise = (2.0 * r.nextDouble() - 1.0) * (1.0 - rho) * range
      clampInt(base + noise, dMin, dMax)
    }
  }

  /** Anti-correlated: a random direction vector scaled so the coordinate sum
    * lands in an epsilon band around the hypercube center plane; dimension-
    * dependent epsilon; int-clamped. The documented worst case for skyline
    * size. (reference: `unified_producer.py:91-123`)
    */
  def antiCorrelated(seed: Long, id: Long, dims: Int, dMin: Int, dMax: Int): Array[Double] = {
    val r = rng(seed, id)
    val epsilon = dims match {
      case 2 => 0.0005
      case 3 => 0.05
      case 4 => 0.9
      case d => d * 0.005 * 100
    }
    val vals = Array.fill(dims)(r.nextDouble())
    val total = vals.sum
    val mean = (dMin + dMax) / 2.0 * dims
    val slack = epsilon * (dMax - dMin).toDouble * dims
    val targetSum = (mean - slack) + r.nextDouble() * 2.0 * slack
    val scale = if (total != 0.0) targetSum / total else 1.0
    vals.map(v => clampInt(v * scale, dMin, dMax))
  }

  def generate(method: String, seed: Long, id: Long, dims: Int, dMin: Int, dMax: Int): Array[Double] =
    method match {
      case "uniform"         => uniform(seed, id, dims, dMin, dMax)
      case "correlated"      => correlated(seed, id, dims, dMin, dMax)
      case "anti_correlated" => antiCorrelated(seed, id, dims, dMin, dMax)
      case other => throw new IllegalArgumentException(s"unknown distribution: $other")
    }
}
