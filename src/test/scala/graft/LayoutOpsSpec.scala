package graft

import graft.operators.LayoutOps
import org.apache.spark.sql.functions._

class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  test("zValue matches a reference bit-interleave") {
    def refZ(x: Long, y: Long): Long =
      (0 until 21).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rnd.nextInt(1 << 21).toLong, rnd.nextInt(1 << 21).toLong))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), LayoutOps.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((x, y) <- pairs) assert(got((x, y)) === refZ(x, y), s"($x, $y)")
  }

  test("z-ordering clusters both dimensions: chunk bounding boxes shrink") {
    // a 64x64 grid in random order; after z-sort, consecutive chunks must
    // cover small rectangles of the grid (that is exactly what makes
    // parquet min/max stats prune on BOTH columns)
    val rnd = new scala.util.Random(11)
    val grid = rnd.shuffle((0L until 64L).flatMap(x => (0L until 64L).map(y => (x, y))))
    val sortedByZ = grid.sortBy { case (x, y) =>
      (0 until 21).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    }
    val chunks = sortedByZ.grouped(256).toSeq // 16 chunks of a 4096-cell grid
    val avgArea = chunks.map { c =>
      val xs = c.map(_._1); val ys = c.map(_._2)
      (xs.max - xs.min + 1).toDouble * (ys.max - ys.min + 1)
    }.sum / chunks.size
    // random chunks would each span ~the whole 64x64=4096 area; z-chunks
    // of 256 cells cover exactly a 16x16=256 box on a power-of-two grid
    assert(avgArea <= 512.0, s"avg chunk area $avgArea")
  }

  test("partitioned write prunes whole directories on partition predicates") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/ev"
    LayoutOps.writePartitioned(
      ev.select(col("event_id"), col("event_type"), col("value")),
      dir, "etype", col("event_type"))
    // hive-style layout on disk
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("etype=")).sorted
    assert(subdirs.nonEmpty && subdirs.forall(_.contains("=")))
    // a partition-column predicate becomes a PartitionFilter (directory
    // pruning) and must NOT appear as a pushed data filter on the scan
    val back = spark.read.parquet(dir).where(col("etype") === "click")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(etype"), plan)
    // the FileScan line carries all filter lists; slice each bracket out
    def bracketAfter(tag: String): String = {
      val i = plan.indexOf(tag)
      if (i < 0) "" else plan.substring(i, plan.indexOf("]", i) + 1)
    }
    assert(!bracketAfter("PushedFilters:").contains("etype"),
      s"partition predicate leaked into pushed filters: $plan")
    assert(!bracketAfter("DataFilters:").contains("etype"),
      s"partition predicate leaked into data filters: $plan")
    val clicks = ev.where(col("event_type") === "click").count()
    assert(back.count() === clicks)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir).getParentFile)
  }

  test("compact collapses a many-small-files table, preserving every row") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val path = s"$base/t"
    // 40 small files
    spark.range(20000).select(col("id"), (col("id") * 2).as("v"))
      .repartition(40).write.parquet(path)
    def parquetFiles = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles === 40)
    val before = spark.read.parquet(path).agg(sum("v"), count(lit(1))).head()
    val n = graft.operators.LayoutOps.compact(spark, path,
      targetFileBytes = 1L * 1024 * 1024)
    val after = spark.read.parquet(path).agg(sum("v"), count(lit(1))).head()
    assert(after === before, "content identical after compaction")
    assert(parquetFiles === n && n < 40, s"files: $parquetFiles (target $n)")
    assert(!new java.io.File(path + "__compacting").exists())
    assert(!new java.io.File(path + "__precompact").exists())
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("compact refuses object-store schemes whose rename is not atomic") {
    // the rename-swap commit would be a copy+delete on these — the guard
    // must fire BEFORE any filesystem call (no s3a client is even loadable
    // here, which itself proves the check precedes FS resolution)
    for (uri <- Seq("s3a://bucket/table", "gs://bucket/table", "abfss://c@a/table")) {
      val e = intercept[IllegalArgumentException] {
        LayoutOps.compact(spark, uri)
      }
      assert(e.getMessage.contains("not atomic"), uri)
    }
  }

  test("rename-swap compact loses the table on a non-atomic-rename FS; " +
      "the manifest-committed layout survives it") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.faux.impl", classOf[FauxCopyDeleteFileSystem].getName)
    val base = java.nio.file.Files.createTempDirectory("graft-manifest").toString
    try {
      // -- the hazard the scheme guard can't fully close: an UNKNOWN
      // object-store-like scheme slips past the known-scheme list, and the
      // swap's second rename dies mid copy+delete → the table path is GONE
      val plain = s"faux://$base/plain"
      spark.range(1000).toDF("id").repartition(8).write.parquet(plain)
      FauxCopyDeleteFileSystem.failRenameTo = Some(s"$base/plain")
      intercept[java.io.IOException] {
        LayoutOps.compact(spark, plain, targetFileBytes = 1L * 1024 * 1024)
      }
      assert(!new java.io.File(s"$base/plain").exists(),
        "demonstrates the data-loss window: the table path vanished")
      FauxCopyDeleteFileSystem.failRenameTo = None

      // -- the fix: the manifested layout never renames the table dir, so
      // the same broken rename (armed on the table root throughout) is
      // never exercised; every commit is one new immutable manifest object
      val mt = s"faux://$base/mt"
      FauxCopyDeleteFileSystem.failRenameTo = Some(s"$base/mt")
      val df = spark.range(2000).select(col("id"), (col("id") * 3).as("v"))
      LayoutOps.writeManifested(df, mt, numFiles = 16)
      val before = LayoutOps.readManifested(spark, mt)
        .agg(sum("v"), count(lit(1))).head()
      val n = LayoutOps.compactManifest(spark, mt,
        targetFileBytes = 4L * 1024 * 1024)
      assert(n < 16, s"compacted to $n files")
      val after = LayoutOps.readManifested(spark, mt)
        .agg(sum("v"), count(lit(1))).head()
      assert(after === before, "content identical through the manifest flip")
      // both generations coexist until vacuum (concurrent readers of the
      // old manifest stay consistent)
      def dataDirs = new java.io.File(s"$base/mt").listFiles()
        .filter(_.getName.startsWith("data-g"))
      assert(dataDirs.length === 2)
      val removed = LayoutOps.vacuumManifested(spark, mt)
      assert(removed === 16, s"vacuum removed $removed superseded files")
      assert(dataDirs.length === 1)
      assert(LayoutOps.readManifested(spark, mt)
        .agg(sum("v"), count(lit(1))).head() === after)
    } finally {
      FauxCopyDeleteFileSystem.failRenameTo = None
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    }
  }

  test("manifested append: generations accumulate, tokens are idempotent, " +
      "time travel reads pinned generations") {
    val base = java.nio.file.Files.createTempDirectory("graft-append").toString
    val mt = s"$base/t"
    try {
      import spark.implicits._
      LayoutOps.appendManifested(Seq(1L, 2L).toDF("id"), mt,
        token = Some("batch-0"))
      LayoutOps.appendManifested(Seq(3L).toDF("id"), mt, token = Some("batch-1"))
      // replay of batch-1 (a restarted stream re-running its last batch)
      // must commit NOTHING
      LayoutOps.appendManifested(Seq(3L).toDF("id"), mt, token = Some("batch-1"))
      LayoutOps.appendManifested(Seq(4L, 5L).toDF("id"), mt,
        token = Some("batch-2"))
      val ids = LayoutOps.readManifested(spark, mt)
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L, 4L, 5L),
        "replayed batch must not double-append")
      // time travel: generation 1 = batches 0+1
      assert(LayoutOps.readManifested(spark, mt, generation = Some(1L))
        .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
      // compaction preserves append history semantics going forward
      val n = LayoutOps.compactManifest(spark, mt)
      assert(LayoutOps.readManifested(spark, mt)
        .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      assert(n >= 1)
      LayoutOps.vacuumManifested(spark, mt)
      intercept[java.io.IOException] {
        LayoutOps.readManifested(spark, mt, generation = Some(1L))
      }
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("zOrderBy preserves rows and orders partitions by z") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("value"))
    val z = LayoutOps.zOrderBy(df, col("user_id"), floor(col("value")), 4)
    assert(z.count() === df.count())
    assert(z.columns.toSeq === df.columns.toSeq, "layout op must not change schema")
  }
}
