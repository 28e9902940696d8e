package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property runner (scalatestplus bridge is not in the
  * offline cache): draws `n` samples from a Gen with a fixed seed chain.
  */
trait PropHelpers {
  def forAll[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default.withSize(50), seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 100)(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb), n) { case (a, b) => f(a, b) }
}
