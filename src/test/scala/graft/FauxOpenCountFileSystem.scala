package graft

import java.net.URI
import java.util.concurrent.atomic.AtomicInteger
import org.apache.hadoop.fs.{FSDataInputStream, Path, RawLocalFileSystem}

/** Local filesystem registered under the `fauxcnt://` scheme that counts
  * `open()` calls on manifest-directory objects — the observable cost of
  * commit-time metadata reads. Lets a spec assert that a 500-generation
  * table's append does O(checkpointInterval) header reads, not O(500).
  */
class FauxOpenCountFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "fauxcnt"
  override def getUri: URI = URI.create("fauxcnt:///")

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    if (f.toUri.getPath.contains("_manifests/"))
      FauxOpenCountFileSystem.manifestOpens.incrementAndGet()
    super.open(f, bufferSize)
  }
}

object FauxOpenCountFileSystem {
  val manifestOpens = new AtomicInteger(0)
}
