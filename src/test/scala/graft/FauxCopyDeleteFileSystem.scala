package graft

import java.net.URI
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Local filesystem registered under the `faux://` scheme that simulates
  * an object store's non-atomic "rename": when the destination matches
  * [[FauxCopyDeleteFileSystem.failRenameTo]], the rename throws mid-flight
  * — exactly what an interrupted copy+delete does on s3/gs/abfs-class
  * stores, where directory rename is client-side and can die between the
  * copy and the delete (or between two renames of a swap protocol).
  * Every other operation behaves like the real local FS, so Spark jobs
  * run normally against `faux://` paths.
  */
class FauxCopyDeleteFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "faux"
  override def getUri: URI = URI.create("faux:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (FauxCopyDeleteFileSystem.failRenameTo.contains(dst.toUri.getPath))
      throw new java.io.IOException(
        s"simulated object-store crash mid copy+delete 'rename' $src -> $dst")
    super.rename(src, dst)
  }
}

object FauxCopyDeleteFileSystem {
  /** Absolute destination path whose next rename should die mid-flight. */
  @volatile var failRenameTo: Option[String] = None
}
