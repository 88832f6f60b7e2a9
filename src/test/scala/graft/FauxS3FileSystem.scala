package graft

import java.net.URI
import org.apache.hadoop.fs.Path

/** S3-SHAPED store under the `fauxs3://` scheme: strongly-consistent
  * list-after-write (modern S3), atomic object PUT (an object appears
  * complete or not at all), conditional PUT on `create(f, overwrite =
  * false)` (`If-None-Match: *` enforced at materialization, inherited
  * from [[FauxAtomicCommitFileSystem]]) — and NO RENAME PRIMITIVE AT
  * ALL for manifest objects. What Hadoop's S3A calls "rename" is a
  * client-side HEAD (exists) + copy-PUT + DELETE: the HEAD and the PUT
  * are separate requests with no transaction between them, and a
  * copy-PUT silently OVERWRITES an object that appeared after the HEAD.
  *
  * That is exactly the store the ConditionalPutCommitArbiter exists
  * for, and exactly the store RenameCommitArbiter is documented NOT to
  * qualify on — previously that claim rested on rename-shaped faux
  * stores (atomic fail-on-exists rename, or a trickled copy with an
  * atomic winner). Here the soak and the double-win race in
  * LayoutOpsSpec run against true S3 shape: two racing "renames" can
  * BOTH report success with one commit silently vanishing, while the
  * conditional-PUT path keeps exactly one winner.
  *
  * `raceWindowMs` holds every manifest copy-PUT for a fixed window
  * between its HEAD and its PUT, making the double-win deterministic
  * for the race spec. Data-file/directory renames (Spark's task-commit
  * machinery) pass through to the atomic parent rename — the manifest
  * protocol is the race surface under test, not Spark's committer.
  */
class FauxS3FileSystem extends FauxAtomicCommitFileSystem {
  override def getScheme: String = "fauxs3c"
  override def getUri: URI = URI.create("fauxs3c:///")

  override def rename(src: Path, dst: Path): Boolean = {
    if (!dst.toString.contains("_manifests") || pathToFile(src).isDirectory)
      return super.rename(src, dst)
    // S3 shape: HEAD...
    if (exists(dst)) return false
    // ...then an unrelated-request copy-PUT that a concurrent committer
    // can interleave with (the window is the defect being modeled)
    FauxS3FileSystem.raceWindow()
    val bytes = java.nio.file.Files.readAllBytes(pathToFile(src).toPath)
    // the PUT itself is atomic (S3 materializes whole objects): stage
    // beside the target, single ATOMIC_MOVE, REPLACE allowed — a later
    // PUT silently overwrites an earlier winner, no error to either
    val tmp = new java.io.File(pathToFile(dst).getParentFile,
      s".put-${java.util.UUID.randomUUID().toString.take(8)}")
    java.nio.file.Files.write(tmp.toPath, bytes)
    java.nio.file.Files.move(tmp.toPath, pathToFile(dst).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    delete(src, false)
    true
  }
}

object FauxS3FileSystem {
  /** Fixed hold between a manifest copy-PUT's HEAD and its PUT; 0 = off. */
  @volatile private[graft] var raceWindowMs: Int = 0
  private def raceWindow(): Unit = {
    val n = raceWindowMs
    if (n > 0) Thread.sleep(n.toLong)
  }
}
