package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class StateCompatSpec extends AnyFunSuite {

  test("fresh checkpoint dir is stamped; matching re-guard passes; mismatch fails with the restart-fresh message") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    StateCompat.guard(dir, "substr", StateCompat.SpanKeyVersion)
    // Same build re-attaching: idempotent.
    StateCompat.guard(dir, "substr", StateCompat.SpanKeyVersion)
    // A build with a different key format must fail LOUDLY before Spark
    // hits the incompatible state.
    val e = intercept[IllegalStateException] {
      StateCompat.guard(dir, "substr", StateCompat.SpanKeyVersion + 1)
    }
    assert(e.getMessage.contains("state-key format mismatch"))
    assert(e.getMessage.contains("Restart the query fresh"))
    // Independent twins keep independent markers.
    StateCompat.guard(dir, "embdedup", StateCompat.EmbKeyVersion)
  }

  test("a pre-marker checkpoint with existing query state refuses to be stamped") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_old")
    // Simulate a <= r12 checkpoint: Spark content, no graft marker.
    java.nio.file.Files.createDirectories(dir.resolve("offsets"))
    java.nio.file.Files.createDirectories(dir.resolve("state"))
    val e = intercept[IllegalStateException] {
      StateCompat.guard(dir.toString, "substr", StateCompat.SpanKeyVersion)
    }
    assert(e.getMessage.contains("no graft format marker"))
    assert(e.getMessage.contains("Restart the query fresh"))
  }
}
