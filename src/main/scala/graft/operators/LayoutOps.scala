package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering values for
  * multi-column locality.
  *
  * Sorting a table by a single column gives parquet min/max pruning on that
  * column only; sorting by the INTERLEAVED bits of two columns gives
  * useful-if-weaker pruning on both — the standard lake-house "Z-ORDER BY"
  * clustering. The z-value here is pure codegen'd integer arithmetic (42
  * shift/mask terms for 2x21 bits), so it can be computed at write time on
  * 100 TB without a UDF in the path: `df.repartitionByRange(n,
  * zValue(...)).sortWithinPartitions(zValue(...)).write.parquet(...)`.
  */
object LayoutOps {

  /** Bits per dimension (2 dims x 21 bits fills 42 of a long's 63
    * positive bits). Inputs must be in [0, 2^21). */
  val bitsPerDim = 21

  /** Morton/Z-value of two non-negative int columns: bit i of `x` lands at
    * position 2i, bit i of `y` at 2i+1. Only bits 0..bits-1 are read, so
    * values outside [0, 2^bits) silently interleave their LOW bits (losing
    * cross-column locality for the high range) — clamp wide domains
    * upstream with [[boundedBucket]]. */
  def zValue(x: Column, y: Column, bits: Int = bitsPerDim): Column =
    (0 until bits).map { i =>
      (shiftright(x.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** Clamp an arbitrary non-negative long into [0, 2^bits) by dropping high
    * bits — the cheap way to feed wide domains (timestamps, ids) into
    * [[zValue]] while keeping locality in the low bits. */
  def boundedBucket(c: Column, bits: Int = bitsPerDim): Column =
    c.cast("long").bitwiseAND(lit((1L << bits) - 1))

  /** Rewrite a DataFrame into z-clustered order on (x, y): range-partition
    * then sort by the z-value, so every output file covers a compact
    * rectangle of the (x, y) space and parquet column stats prune on BOTH
    * dimensions. */
  def zOrderBy(df: DataFrame, x: Column, y: Column,
               numPartitions: Int): DataFrame = {
    val z = zValue(boundedBucket(x), boundedBucket(y))
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Hive-style partitioned parquet write on a derived column: the
    * standard date/category layout that turns a predicate on the
    * partition column into DIRECTORY pruning (whole partitions never
    * open — stronger than row-group stats). The repartition on the
    * partition column keeps it one file per partition value per write
    * instead of numPartitions small files each.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       value: Column): Unit =
    df.withColumn(partitionCol, value)
      .repartition(col(partitionCol))
      .write.mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Compact a parquet directory to ~`targetFileBytes` output files — the
    * small-files maintenance pass every streaming/incremental writer needs
    * (thousands of KB-sized files turn scans into metadata storms and
    * starve HDFS namenodes). File count is sized from the CURRENT on-disk
    * bytes (already-encoded parquet, so the estimate is honest), then the
    * data is rewritten through a single repartition into a temp dir and
    * atomically* swapped in (*rename-atomic on posix/HDFS; object-store
    * schemes are REFUSED up front — their copy+delete "rename" would
    * expose readers to a missing table; use a manifest-committing table
    * format there). Refuses a
    * Hive-partitioned root (compact leaf partition dirs individually —
    * a flat rewrite would destroy the layout and re-infer partition
    * values).
    * @return number of parquet files present after the swap
    */
  /** FS schemes whose "rename" is a non-atomic client-side copy+delete —
    * the directory swap in [[compact]] would expose concurrent readers to
    * a missing or half-copied table on these. Object stores need a
    * manifest-committing table format instead. */
  private val nonAtomicRenameSchemes = Set(
    "s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss", "oss",
    "cos", "cosn", "swift")

  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetFileBytes > 0)
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    // guard BEFORE any FS call: the rename-swap commit below is only safe
    // where directory rename is atomic (posix, HDFS)
    val scheme = Option(p.toUri.getScheme).getOrElse(
      org.apache.hadoop.fs.FileSystem.getDefaultUri(conf).getScheme)
    require(scheme == null || !nonAtomicRenameSchemes.contains(scheme.toLowerCase),
      s"compact() commits by directory rename, which is not atomic on " +
        s"'$scheme' — use the manifest-committed layout (writeManifested /" +
        s" compactManifest) on object stores")
    val fs = p.getFileSystem(conf)
    // refuse Hive-partitioned layouts: a flat re-read would strip the
    // directory structure AND re-infer partition values by type
    // ('pc=00123' -> int 123) — compact each leaf partition dir instead
    val partitioned = fs.listStatus(p)
      .exists(s => s.isDirectory && s.getPath.getName.contains("="))
    require(!partitioned,
      s"$path is Hive-partitioned; compact each partition directory, not the root")
    val totalBytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    // siblings via Path(parent, name+suffix): string concat would nest
    // them INSIDE the table when `path` carries a trailing slash
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, p.getName + "__compacting")
    val bak = new org.apache.hadoop.fs.Path(p.getParent, p.getName + "__precompact")
    fs.delete(tmp, true)
    spark.read.parquet(p.toString).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(bak, true)
    require(fs.rename(p, bak), s"could not move $path aside")
    if (!fs.rename(tmp, p)) {
      // roll the original back before failing — the table path must never
      // be left empty
      fs.rename(bak, p)
      throw new java.io.IOException(s"could not move compacted data into $path")
    }
    fs.delete(bak, true)
    // actual files written (empty repartition slots produce none)
    fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
  }

  // ---- manifest-committed table layout (object-store safe) -------------
  // The rename-swap in [[compact]] is only atomic on posix/HDFS; on an
  // object store a directory "rename" is a client-side copy+delete that
  // exposes concurrent readers to a missing or half-copied table. The
  // standard answer (the core of every lake-house table format) is a
  // MANIFEST: data files are immutable and write-once, and the table's
  // current state is whatever the highest-numbered manifest file lists.
  // Commit = make one new small manifest object visible; readers resolve
  // the listing, never the data directory. A single-FILE rename is safe
  // even as copy+delete — the destination object appears complete or not
  // at all — which is exactly the property the directory swap lacks.
  //
  // Layout:  <root>/_manifests/%020d.manifest   (one line per data file,
  //          paths relative to <root>)
  //          <root>/data-g<gen>-<uuid>/part-*.parquet
  //
  // Single-writer assumption: two concurrent committers race to create
  // the same generation number; the loser's rename fails (destination
  // exists) and it must retry on the new latest. (S3-class stores that
  // cannot fail-on-exists need a conditional-PUT or a lock service for
  // multi-writer — same caveat as every manifest-based format.)

  private val manifestsDirName = "_manifests"
  private val manifestSuffix = ".manifest"

  private def manifestGen(name: String): Option[Long] =
    if (name.endsWith(manifestSuffix))
      name.stripSuffix(manifestSuffix).toLongOption
    else None

  /** (generation, path) of the newest committed manifest, if any. */
  private def latestManifest(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Option[(Long, org.apache.hadoop.fs.Path)] = {
    val md = new org.apache.hadoop.fs.Path(root, manifestsDirName)
    if (!fs.exists(md)) None
    else fs.listStatus(md).toSeq
      .flatMap(s => manifestGen(s.getPath.getName).map(_ -> s.getPath))
      .sortBy(_._1).lastOption
  }

  private def readManifestLines(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Seq[String] = {
    val in = fs.open(p)
    val content =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    content.split("\n").toSeq.filter(_.nonEmpty)
  }

  /** Data files listed by a manifest (header/comment lines skipped). */
  private def readManifestFiles(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Seq[String] =
    readManifestLines(fs, p).filterNot(_.startsWith("#"))

  /** The idempotence token a manifest was committed with, if any. */
  private def manifestToken(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[String] =
    readManifestLines(fs, p).collectFirst {
      case l if l.startsWith("#token=") => l.stripPrefix("#token=") }

  /** Commit `files` (relative paths) as generation `gen`: write a temp
    * manifest object fully, then rename it to the final name. Fails if
    * the generation was committed concurrently. */
  private def commitManifest(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, gen: Long, files: Seq[String],
      token: Option[String] = None): Unit = {
    val md = new org.apache.hadoop.fs.Path(root, manifestsDirName)
    fs.mkdirs(md)
    val tmp = new org.apache.hadoop.fs.Path(md,
      s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val header = token.map(t => s"#token=$t\n").getOrElse("")
    val out = fs.create(tmp, false)
    try out.write((header + files.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val target = new org.apache.hadoop.fs.Path(md, f"$gen%020d$manifestSuffix")
    if (fs.exists(target) || !fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(
        s"manifest generation $gen was committed concurrently at $target — " +
          "re-read the table and retry")
    }
  }

  private def newDataDir(gen: Long): String =
    s"data-g$gen-${java.util.UUID.randomUUID().toString.take(8)}"

  /** Create (or advance) a manifest-committed table at `path` with the
    * contents of `df`. Data lands in a fresh immutable directory; the
    * table flips to it atomically via the manifest commit. Previous
    * generations stay on disk (time travel / concurrent readers) until
    * [[vacuumManifested]]. */
  def writeManifested(df: DataFrame, path: String,
                      numFiles: Int = 0): Unit = {
    val spark = df.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gen = latestManifest(fs, root).map(_._1 + 1).getOrElse(0L)
    val dataDir = newDataDir(gen)
    val out = if (numFiles > 0) df.repartition(numFiles) else df
    out.write.parquet(new org.apache.hadoop.fs.Path(root, dataDir).toString)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(root, dataDir))
      .map(_.getPath.getName).filter(_.endsWith(".parquet")).sorted
      .map(n => s"$dataDir/$n").toSeq
    commitManifest(fs, root, gen, files)
  }

  /** Append `df` to a manifest-committed table: new data dir + a new
    * manifest listing the old live files PLUS the new ones. A repeated
    * commit with the same `token` is a NO-OP — pass the micro-batch id
    * from `foreachBatch` and a restarted streaming query cannot
    * double-append its replayed batch (the manifest layout's equivalent
    * of an idempotent sink). Creates the table when none exists. */
  def appendManifested(df: DataFrame, path: String, numFiles: Int = 0,
                       token: Option[String] = None): Unit = {
    val spark = df.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val latest = latestManifest(fs, root)
    if (token.isDefined && latest.exists(m => manifestToken(fs, m._2) == token))
      return // this batch already committed — replay is a no-op
    val (gen, old) = latest match {
      case Some((g, mp)) => (g + 1, readManifestFiles(fs, mp))
      case None          => (0L, Seq.empty[String])
    }
    val dataDir = newDataDir(gen)
    val out = if (numFiles > 0) df.repartition(numFiles) else df
    out.write.parquet(new org.apache.hadoop.fs.Path(root, dataDir).toString)
    val added = fs.listStatus(new org.apache.hadoop.fs.Path(root, dataDir))
      .map(_.getPath.getName).filter(_.endsWith(".parquet")).sorted
      .map(n => s"$dataDir/$n").toSeq
    commitManifest(fs, root, gen, old ++ added, token)
  }

  /** Read a manifest-committed table: resolve the newest manifest (or a
    * pinned `generation` — time travel across un-vacuumed history) and
    * load exactly the files it lists — in-flight or superseded data
    * directories are invisible. */
  def readManifested(spark: org.apache.spark.sql.SparkSession,
                     path: String, generation: Option[Long] = None): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mp = generation match {
      case Some(g) =>
        val p = new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(root, manifestsDirName),
          f"$g%020d$manifestSuffix")
        if (!fs.exists(p)) throw new java.io.IOException(
          s"$path has no manifest generation $g (vacuumed or never committed)")
        p
      case None => latestManifest(fs, root).map(_._2)
        .getOrElse(throw new java.io.IOException(
          s"$path has no committed manifest — not a manifested table"))
    }
    val files = readManifestFiles(fs, mp)
      .map(f => new org.apache.hadoop.fs.Path(root, f).toString)
    if (files.isEmpty)
      // an empty generation (e.g. created from an empty batch) still has
      // a schema-less nothing to read; surface it as an explicit error
      throw new java.io.IOException(s"manifest $mp lists no data files")
    spark.read.parquet(files: _*)
  }

  /** Compact a manifest-committed table to ~`targetFileBytes` files —
    * the object-store-safe sibling of [[compact]]. New files are written
    * BESIDE the live ones and the table flips via one manifest commit;
    * no table-directory rename ever happens, so readers on any scheme
    * (including copy+delete-rename object stores) always resolve a fully
    * present generation. Superseded files survive until
    * [[vacuumManifested]].
    * @return number of data files in the new generation
    */
  def compactManifest(spark: org.apache.spark.sql.SparkSession, path: String,
                      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetFileBytes > 0)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (gen, mp) = latestManifest(fs, root).getOrElse(throw new java.io.IOException(
      s"$path has no committed manifest — writeManifested() it first"))
    val live = readManifestFiles(fs, mp)
    val totalBytes = live.map(f =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(root, f)).getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val dataDir = newDataDir(gen + 1)
    spark.read
      .parquet(live.map(f => new org.apache.hadoop.fs.Path(root, f).toString): _*)
      .repartition(nFiles)
      .write.parquet(new org.apache.hadoop.fs.Path(root, dataDir).toString)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(root, dataDir))
      .map(_.getPath.getName).filter(_.endsWith(".parquet")).sorted
      .map(n => s"$dataDir/$n").toSeq
    commitManifest(fs, root, gen + 1, files)
    files.size
  }

  /** Delete data files no longer referenced by the NEWEST manifest, plus
    * superseded manifest files. Destroys time travel and breaks readers
    * still resolving an old generation — production systems gate this on
    * a retention window; here it is the explicit cleanup step.
    * @return number of data files deleted
    */
  def vacuumManifested(spark: org.apache.spark.sql.SparkSession,
                       path: String): Int = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (gen, mp) = latestManifest(fs, root).getOrElse(throw new java.io.IOException(
      s"$path has no committed manifest — nothing to vacuum"))
    val live = readManifestFiles(fs, mp).toSet
    var removed = 0
    fs.listStatus(root).filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("data-g")).foreach { d =>
      val dirName = d.getPath.getName
      val entries = fs.listStatus(d.getPath)
      val (keep, drop) = entries
        .filter(_.getPath.getName.endsWith(".parquet"))
        .partition(e => live.contains(s"$dirName/${e.getPath.getName}"))
      drop.foreach { e => fs.delete(e.getPath, false); removed += 1 }
      if (keep.isEmpty) fs.delete(d.getPath, true) // whole superseded generation
    }
    val md = new org.apache.hadoop.fs.Path(root, manifestsDirName)
    fs.listStatus(md).foreach { m =>
      if (manifestGen(m.getPath.getName).exists(_ < gen))
        fs.delete(m.getPath, false)
    }
    removed
  }
}
