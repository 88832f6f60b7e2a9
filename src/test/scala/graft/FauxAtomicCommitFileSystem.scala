package graft

import java.net.URI
import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}

/** Local filesystem registered under the `fauxcommit://` scheme that
  * provides the two commit primitives the manifest arbiters are DOCUMENTED
  * against, each made genuinely atomic under a process-wide lock:
  *
  *  - `rename(src, dst)` fails (returns false) when `dst` exists, with the
  *    exists-check and the rename in one critical section — HDFS rename
  *    semantics. (Raw local rename(2) silently REPLACES an existing file,
  *    so soaking [[graft.operators.LayoutOps.RenameCommitArbiter]] on the
  *    bare local FS would race in the store, not in the protocol.)
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
  */
class FauxAtomicCommitFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "fauxcommit"
  override def getUri: URI = URI.create("fauxcommit:///")

  private def rawCreate(f: Path): FSDataOutputStream = super.create(f, true)

  override def rename(src: Path, dst: Path): Boolean =
    FauxAtomicCommitFileSystem.lock.synchronized {
      if (exists(dst)) false else super.rename(src, dst)
    }

  override def create(f: Path, overwrite: Boolean): FSDataOutputStream = {
    if (overwrite) return super.create(f, true)
    val buf = new java.io.ByteArrayOutputStream()
    val self = this
    new FSDataOutputStream(new java.io.FilterOutputStream(buf) {
      override def close(): Unit = {
        super.close()
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
}
