package graft

import java.net.URI
import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}

/** Local filesystem registered under the `fauxcommit://` scheme that
  * provides the two commit primitives the manifest arbiters are DOCUMENTED
  * against, each made genuinely atomic under a process-wide lock:
  *
  *  - `rename(src, dst)` fails (returns false) when `dst` exists, with the
  *    exists-check and the rename in one critical section — HDFS rename
  *    semantics. The move itself is `Files.move(ATOMIC_MOVE)`, NOT
  *    `RawLocalFileSystem.rename`: Hadoop's local rename silently degrades
  *    to a non-atomic `FileUtil.copy` when `File.renameTo` fails (observed
  *    once under heavy box I/O pressure), which exposes a partially-copied
  *    manifest to concurrent readers — the exact store defect the r8 soak
  *    anomaly traced to. ATOMIC_MOVE throws instead of degrading, so this
  *    store can never violate its documented all-or-nothing contract.
  *    (The deliberately-degrading sibling [[CopyFallbackFauxFileSystem]]
  *    models the Hadoop fallback for the protocol's truncation-detection
  *    specs.)
  *
  *  - `create(f, overwrite = false)` buffers the payload and materializes
  *    it at CLOSE, keep-first under the lock — S3 `If-None-Match: *` /
  *    GCS `ifGenerationMatch=0` semantics: the object appears complete or
  *    not at all, exactly one writer per name wins, and a loser's payload
  *    is never visible (its read-back then sees the winner and reports the
  *    commit lost). No partial manifest is ever observable, unlike a plain
  *    filesystem where an in-progress create is a visible partial file.
  *
  * Only the two-argument `create(Path, Boolean)` overload (the one the
  * arbiters call) gets the conditional-PUT treatment; Spark's data-file
  * writers use the full overloads and pass through to the raw store.
  *
  * [[FauxAtomicCommitFileSystem.injectLatencyMs]] adds a random 0..N ms
  * sleep immediately BEFORE each commit primitive takes the lock, widening
  * the race window between a committer's decision (listing the latest
  * generation) and its commit — the soak runs with and without it.
  */
class FauxAtomicCommitFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "fauxcommit"
  override def getUri: URI = URI.create("fauxcommit:///")

  private def rawCreate(f: Path): FSDataOutputStream = super.create(f, true)

  override def rename(src: Path, dst: Path): Boolean = {
    FauxAtomicCommitFileSystem.maybeDelay()
    FauxAtomicCommitFileSystem.lock.synchronized {
      if (exists(dst)) false
      else {
        java.nio.file.Files.move(
          pathToFile(src).toPath, pathToFile(dst).toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        true
      }
    }
  }

  override def create(f: Path, overwrite: Boolean): FSDataOutputStream = {
    if (overwrite) return super.create(f, true)
    val buf = new java.io.ByteArrayOutputStream()
    val self = this
    new FSDataOutputStream(new java.io.FilterOutputStream(buf) {
      override def close(): Unit = {
        super.close()
        FauxAtomicCommitFileSystem.maybeDelay()
        FauxAtomicCommitFileSystem.lock.synchronized {
          // keep-first: a concurrent winner's object survives; this
          // writer's payload is dropped, to be caught by the arbiter's
          // read-back verification
          if (!self.exists(f)) {
            val out = self.rawCreate(f)
            try out.write(buf.toByteArray) finally out.close()
          }
        }
      }
    }, null)
  }
}

object FauxAtomicCommitFileSystem {
  private[graft] val lock = new Object

  /** Artificial latency: each commit primitive sleeps a uniform-random
    * 0..N ms before entering its critical section. 0 = off. */
  @volatile private[graft] var injectLatencyMs: Int = 0

  private def maybeDelay(): Unit = {
    val n = injectLatencyMs
    if (n > 0)
      Thread.sleep(java.util.concurrent.ThreadLocalRandom.current()
        .nextLong(n.toLong + 1))
  }
}

/** The DEGRADED store: rename deliberately falls back to a visible,
  * trickled copy+delete — modeling what `RawLocalFileSystem.rename`
  * actually does when `File.renameTo` fails (Hadoop 3.4.2 falls through
  * to `FileUtil.copy`). Winner choice stays atomic (one copier per
  * destination, decided under the lock) but VISIBILITY is not: a reader
  * polling the destination mid-copy sees a growing file — a short head.
  * The manifest protocol must detect that truncation rather than commit
  * on it; the soak in LayoutOpsSpec runs against this store to prove it
  * does. */
class CopyFallbackFauxFileSystem extends FauxAtomicCommitFileSystem {
  override def getScheme: String = "fauxcopy"
  override def getUri: URI = URI.create("fauxcopy:///")

  override def rename(src: Path, dst: Path): Boolean = {
    // only COMMIT renames degrade (the protocol's race surface); Spark's
    // own task-commit directory renames pass through atomically
    if (!dst.toString.contains("_manifests") || pathToFile(src).isDirectory)
      return super.rename(src, dst)
    val claimed = FauxAtomicCommitFileSystem.lock.synchronized {
      // atomic winner choice: claim dst by creating it empty
      !exists(dst) && pathToFile(dst).createNewFile()
    }
    if (!claimed) return false
    // ... but NON-atomic materialization, outside any lock: the bytes
    // land in small flushed slices with real delays, exactly like
    // FileUtil.copy through a 4k buffer on a saturated disk
    val bytes = java.nio.file.Files.readAllBytes(pathToFile(src).toPath)
    val out = new java.io.FileOutputStream(pathToFile(dst))
    try {
      var i = 0
      while (i < bytes.length) {
        val n = math.min(24, bytes.length - i)
        out.write(bytes, i, n)
        out.flush()
        Thread.sleep(1)
        i += n
      }
    } finally out.close()
    java.nio.file.Files.delete(pathToFile(src).toPath)
    true
  }
}
