package graft.core

/** The reference's three synthetic QoS distributions
  * (reference: `python/unified_producer.py:50-123`), re-expressed as pure
  * functions of `(seed, recordId)` so generation is deterministic under ANY
  * partitioning of the id range — the property a distributed generator needs
  * (the Python original is a single sequential RNG stream).
  *
  * The uniform draws are ENGINE-NEUTRAL: draw k for record id is the top 52
  * bits of `md5("$seed:$id:$k")` over 2⁵², so any SQL engine with md5 can
  * replay the exact stream (this is what gives `datagen_sky2d` a DuckDB
  * oracle). md5 rather than a splitmix/xorshift chain because replaying
  * wrapping 64-bit multiplies needs modular 2⁶⁴ arithmetic, and DuckDB's
  * checked BIGINT (and 128-bit-bounded HUGEINT) traps on exactly those
  * overflows — the hash is the one shared primitive both engines evaluate
  * bit-identically. All downstream arithmetic is plain IEEE-754 double ops
  * in a fixed evaluation order, so the oracle reproduces results exactly,
  * not approximately.
  *
  * Values are integer-clamped to `[dMin, dMax]` like the reference:
  * truncation toward zero matches Python `int()` for all inputs (correlated
  * noise and anti-correlated scaling can go negative mid-computation), and
  * the subsequent clamp bounds the result to the domain either way.
  */
object DataGen {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Uniform double in [0, 1): bits of md5("$seed:$id:$k") — the first 13
    * hex chars (= first 6 bytes and the high nibble of the 7th) big-endian,
    * over 2⁵². Replayed in SQL as a 13-term hex-char polynomial divided by
    * 4503599627370496.0. */
  def u(seed: Long, id: Long, k: Int): Double = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s"$seed:$id:$k".getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v = (v << 4) | ((d(6) & 0xf0L) >>> 4)
    v / 4503599627370496.0
  }

  private def clampInt(v: Double, dMin: Int, dMax: Int): Double =
    math.max(dMin.toDouble, math.min(dMax.toDouble, v.toInt.toDouble))

  /** Each dimension i.i.d. uniform integer in [dMin, dMax].
    * (reference: `unified_producer.py:50-51`)
    */
  def uniform(seed: Long, id: Long, dims: Int, dMin: Int, dMax: Int): Array[Double] = {
    val n = (dMax - dMin + 1).toDouble
    Array.tabulate(dims)(k => dMin + (u(seed, id, k) * n).toInt.toDouble)
  }

  /** Positively correlated: base ~ U(dMin,dMax); each dim = base + noise,
    * noise ~ U(±(1−rho)·range); int-clamped. rho defaults to 0.9 like the
    * reference. (reference: `unified_producer.py:63-76`)
    */
  def correlated(seed: Long, id: Long, dims: Int, dMin: Int, dMax: Int, rho: Double = 0.9): Array[Double] = {
    val range = (dMax - dMin).toDouble
    val base = dMin + u(seed, id, 0) * range
    Array.tabulate(dims) { k =>
      val noise = (2.0 * u(seed, id, k + 1) - 1.0) * (1.0 - rho) * range
      clampInt(base + noise, dMin, dMax)
    }
  }

  /** Anti-correlated: a random direction vector scaled so the coordinate sum
    * lands in an epsilon band around the hypercube center plane; dimension-
    * dependent epsilon; int-clamped. The documented worst case for skyline
    * size. (reference: `unified_producer.py:91-123`)
    */
  def antiCorrelated(seed: Long, id: Long, dims: Int, dMin: Int, dMax: Int): Array[Double] = {
    val epsilon = dims match {
      case 2 => 0.0005
      case 3 => 0.05
      case 4 => 0.9
      case d => d * 0.005 * 100
    }
    val vals = Array.tabulate(dims)(k => u(seed, id, k))
    val total = vals.sum
    val mean = (dMin + dMax) / 2.0 * dims
    val slack = epsilon * (dMax - dMin).toDouble * dims
    val targetSum = (mean - slack) + u(seed, id, dims) * 2.0 * slack
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
