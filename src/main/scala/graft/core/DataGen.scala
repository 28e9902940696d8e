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

  /** Per-thread memo of the last digest: generators draw k = 0, 1, 2, …
    * per record, and two consecutive draws share one digest (see [[u]]),
    * so the second is a cache hit — digest count per record is
    * ⌈draws/2⌉, not draws. */
  private final class DigestMemo {
    var seed: Long = Long.MinValue
    var id: Long = Long.MinValue
    var kk: Int = -1
    var d: Array[Byte] = null
  }
  private val memoLocal = new ThreadLocal[DigestMemo] {
    override def initialValue(): DigestMemo = new DigestMemo
  }

  /** Uniform double in [0, 1): 52 bits of md5("$seed:$id:${k/2}") — hex
    * chars 1–13 (even k) or 14–26 (odd k) big-endian over 2⁵², so one
    * digest yields two independent draws (md5 bytes are pairwise
    * independent for this purpose). Replayed in SQL as a 13-term hex-char
    * polynomial over the same substring, divided by 4503599627370496.0. */
  def u(seed: Long, id: Long, k: Int): Double = {
    // k = -1 would alias the DigestMemo's kk = -1 sentinel (null digest →
    // NPE); no current caller passes one, but fail clearly if one ever does.
    require(k >= 0, s"draw index must be non-negative: k=$k")
    val kk = k >> 1
    val m = memoLocal.get()
    if (m.seed != seed || m.id != id || m.kk != kk) {
      val md = md5Local.get()
      md.reset()
      m.d = md.digest(s"$seed:$id:$kk".getBytes("UTF-8"))
      m.seed = seed; m.id = id; m.kk = kk
    }
    val d = m.d
    var v = 0L
    if ((k & 1) == 0) { // hex chars 1..13: bytes 0..5 + high nibble of 6
      var i = 0
      while (i < 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      v = (v << 4) | ((d(6) & 0xf0L) >>> 4)
    } else {            // hex chars 14..26: low nibble of 6 + bytes 7..12
      v = d(6) & 0x0fL
      var i = 7
      while (i < 13) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    }
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
