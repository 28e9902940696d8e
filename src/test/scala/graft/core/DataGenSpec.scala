package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** Generator parity checks (FIXTURES.md §2): determinism under reordering,
  * domain clamping, and skyline-size character per distribution (uniform ≪
  * correlated < anti-correlated at the same cardinality).
  */
class DataGenSpec extends AnyFunSuite {

  private val seed = 42L

  test("deterministic and order-independent in id") {
    val a = DataGen.uniform(seed, 123L, 3, 0, 10000)
    val b = DataGen.uniform(seed, 123L, 3, 0, 10000)
    assert(a.sameElements(b))
    val ids = Seq(5L, 1L, 9L)
    val fwd = ids.map(DataGen.antiCorrelated(seed, _, 2, 0, 10000).toSeq)
    val rev = ids.reverse.map(DataGen.antiCorrelated(seed, _, 2, 0, 10000).toSeq).reverse
    assert(fwd == rev)
  }

  test("values integer-clamped to domain") {
    for (m <- Seq("uniform", "correlated", "anti_correlated"); id <- 0L until 2000L) {
      val v = DataGen.generate(m, seed, id, 3, 0, 10000)
      assert(v.forall(x => x >= 0 && x <= 10000 && x == math.floor(x)), s"$m $id ${v.toSeq}")
    }
  }

  test("skyline-size character per distribution (2D, 50k points)") {
    def skySize(m: String): Int = {
      val buf = new ArrayBuffer[Array[Double]]
      (0L until 50000L).foreach(id => buf += DataGen.generate(m, seed, id, 2, 0, 10000))
      SkylineKernel.skylineOf(buf).size
    }
    val (u, c, a) = (skySize("uniform"), skySize("correlated"), skySize("anti_correlated"))
    // report (pdf p.16 §5.1): uniform tiny (≈8), correlated duplicate-heavy,
    // anti-correlated worst case (thousands). RNG streams differ so assert
    // ordering + envelopes, not exact counts.
    assert(u < 60, s"uniform skyline should be tiny, got $u")
    assert(a > c && c > u, s"expected anti($a) > corr($c) > unif($u)")
    assert(a > 500, s"anti-correlated skyline should be large, got $a")
  }
}
