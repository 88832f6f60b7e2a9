package graft

import java.net.URI
import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}

/** Local filesystem registered under the `fauxs3://` scheme that simulates
  * stock Hadoop S3A create-semantics: `create(f, overwrite = false)` is a
  * HEAD existence check at OPEN time plus an unconditional PUT at CLOSE —
  * it never fails on a concurrently-created object, and the last close
  * wins. [[FauxCheckAtOpenFileSystem.afterPut]] fires once immediately
  * after a close lands its "PUT", letting a spec interleave a competing
  * writer's PUT into the exact window between our close and any
  * verification read — the race ConditionalPutCommitArbiter's read-back
  * is meant to detect.
  */
class FauxCheckAtOpenFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "fauxs3"
  override def getUri: URI = URI.create("fauxs3:///")

  override def create(f: Path, overwrite: Boolean): FSDataOutputStream = {
    // stale-HEAD simulation: existence never fails the open
    val out = super.create(f, true)
    new FSDataOutputStream(new java.io.FilterOutputStream(out) {
      override def close(): Unit = {
        super.close()
        val cb = FauxCheckAtOpenFileSystem.afterPut
        FauxCheckAtOpenFileSystem.afterPut = None
        cb.foreach(_())
      }
    }, null)
  }
}

object FauxCheckAtOpenFileSystem {
  /** One-shot callback fired right after the next create-stream close. */
  @volatile var afterPut: Option[() => Unit] = None
}
