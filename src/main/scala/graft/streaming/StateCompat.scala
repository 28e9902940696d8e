package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** Loud-failure guard for STATE-KEY FORMAT changes across builds.
  *
  * Spark's state-store schema checker rejects an incompatible checkpoint
  * (e.g. the r13 change of [[StreamSubstrDedup]] / [[StreamBoilerplate]]
  * span keys from 32-char md5 hex strings to raw 16-byte binary) with a
  * generic state-schema error deep in the first micro-batch — correct,
  * but opaque. This guard turns it into an immediate, named error: call
  * [[guard]] with the query's checkpoint directory BEFORE `start()`; it
  * stamps a per-twin format-version marker into the directory on first
  * use and fails with a restart-fresh message when a checkpoint written
  * by a different format is reused. See UPGRADING.md for the format
  * history.
  */
object StateCompat {

  /** Span-keyed twins ([[StreamSubstrDedup]], [[StreamBoilerplate]]):
    * v1 = 32-char md5 hex string keys (≤ r12), v2 = raw 16-byte binary
    * keys (r13+). */
  val SpanKeyVersion = 2

  /** [[StreamEmbDedup]] bucket-keyed state: v1 = int bucket keys
    * (single-table) and the multi-table table<<16|bucket keys. */
  val EmbKeyVersion = 1

  /** Validate (or stamp) the state-key format marker for `twin` in
    * `checkpointDir`. Throws [[IllegalStateException]] with a
    * restart-fresh message on a version mismatch — BEFORE Spark touches
    * the incompatible state — and ALSO when the directory already holds
    * checkpoint content (offsets/state/commits) without any marker: that
    * is exactly the pre-guard (≤ r12) checkpoint this guard exists for,
    * and stamping it with the CURRENT version would record the migration
    * backwards and silence the loud path forever. Idempotent on a
    * matching marker; creates the directory if absent (Spark accepts a
    * pre-existing checkpoint root). Local-filesystem checkpoints only
    * (the single-JVM scope of this build); a distributed deployment
    * would route through the checkpoint's FileSystem. */
  def guard(checkpointDir: String, twin: String, version: Int): Unit = {
    val dir = Paths.get(checkpointDir)
    val marker = dir.resolve(s"_graft_state_version_$twin")
    if (Files.exists(marker)) {
      val prev = new String(Files.readAllBytes(marker), UTF_8).trim
      if (prev != version.toString)
        throw new IllegalStateException(
          s"graft state-key format mismatch for '$twin': checkpoint " +
            s"$checkpointDir was written by format v$prev, this build " +
            s"uses v$version (state-store keys are physically " +
            "incompatible — e.g. r13 moved span keys from hex strings " +
            "to 16-byte binary). Restart the query fresh with a new " +
            "checkpoint directory; the old state cannot be restored.")
    } else if (Seq("offsets", "state", "commits")
        .exists(s => Files.exists(dir.resolve(s)))) {
      throw new IllegalStateException(
        s"graft state-key format unknown for '$twin': checkpoint " +
          s"$checkpointDir holds existing query state but no graft " +
          "format marker — it predates this guard (a pre-marker build, " +
          "e.g. the ≤ r12 hex-string span keys). Restart the query " +
          "fresh with a new checkpoint directory, or, if the state is " +
          s"KNOWN to match format v$version, stamp it manually: " +
          s"write '$version' to ${marker.getFileName}.")
    } else {
      Files.createDirectories(dir)
      // Atomic stamp WITH content: the bytes are written to a private
      // temp file and LINKED into place — link creation either publishes
      // the fully-written marker or fails with FileAlreadyExists, so a
      // racing guard can never observe a created-but-empty marker (the
      // CREATE_NEW + write form had that window: the loser could re-read
      // before the winner's bytes landed and throw a spurious mismatch).
      // The loser re-enters the validate branch and converges
      // deterministically — same version passes, a racing DIFFERENT
      // version fails loudly instead of silently last-writing.
      val tmp = dir.resolve(
        s"${marker.getFileName}.tmp-${ProcessHandle.current.pid}-${System.nanoTime}")
      Files.write(tmp, version.toString.getBytes(UTF_8))
      try Files.createLink(marker, tmp)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          guard(checkpointDir, twin, version)
        // Filesystems without hard links (FAT/exFAT, some network
        // mounts) throw instead of linking — fall back to the plain
        // CREATE_NEW write there. That form has the observable-empty
        // window the link publish closes, but only between two guards
        // racing the FIRST stamp on such a filesystem; the loser
        // re-validates and converges the same way.
        // FileSystemException is caught BROADLY on purpose: a disk-full
        // or permission failure on the link retries as a CREATE_NEW
        // write to the same directory, which then throws ITS OWN
        // (uncaught) error under the same condition — nothing is
        // swallowed, the failure just surfaces from the fallback write.
        case _: UnsupportedOperationException |
             _: java.nio.file.FileSystemException =>
          try Files.write(marker, version.toString.getBytes(UTF_8),
            java.nio.file.StandardOpenOption.CREATE_NEW)
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              Files.deleteIfExists(tmp)
              guard(checkpointDir, twin, version)
          }
      }
      finally Files.deleteIfExists(tmp)
    }
  }
}
