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
        s"'$scheme' — object stores need a manifest-committing table format")
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
}
