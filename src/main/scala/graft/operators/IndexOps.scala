package graft.operators

import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.lib.input.TextInputFormat
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Inverted-index / retrieval operators: the assignment-3 family of the
  * reference (compressed index build, postings lookup, boolean retrieval).
  *
  * Reference semantics:
  *  - docid = byte offset of the line in the UNCOMPRESSED collection
  *    (reference/assignment3/src/main/BuildInvertedIndexCompressed.java:76;
  *    the driver later seek()s that offset to print the matching line,
  *    BooleanRetrievalCompressed.java:124-129)
  *  - postings = (docid, tf) pairs, docid-ascending, stored d-gap + VInt
  *    byte-packed (BuildInvertedIndexCompressed.java:125-126)
  *  - boolean queries are RPN: term -> push docid set, AND -> intersect,
  *    OR -> union (BooleanRetrievalCompressed.java:47-102)
  *
  * Architecture: the reference needs a secondary sort (composite (term,docid)
  * key + custom partitioner) and cross-reducer-call mutable state to stream
  * postings in docid order; Spark replaces all of it with
  * `sort_array(collect_list(struct(docid,tf)))` inside one aggregation —
  * partial aggregation handles the combining, no operator-scoped state. The
  * MapFile random-access store becomes a term-keyed DataFrame: a point
  * lookup is `filter($"term" === t)`, which at scale is served by parquet
  * predicate pushdown over term-sorted files (S5/S9).
  */
object IndexOps {

  /** Read a text collection keeping byte offsets as docids — S1/S6.
    * `spark.read.text` drops offsets; the Hadoop LineRecordReader surfaces
    * them, and they are the docids every golden output is keyed by.
    */
  def corpusWithOffsets(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .newAPIHadoopFile[LongWritable, Text, TextInputFormat](path)
      .map { case (off, line) => (off.get(), line.toString) }
      .toDF("docid", "text")
  }

  /** (term, docid, tf) — A6: per-document term frequencies. */
  def termDocTf(corpus: DataFrame, docidCol: String, textCol: String): DataFrame =
    corpus
      .select(col(docidCol).as("docid"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("term", "docid").agg(count(lit(1)).as("tf"))

  /** term -> (df, postings sorted by docid) — R1/T2 structural index. */
  def invertedIndex(corpus: DataFrame, docidCol: String, textCol: String): DataFrame =
    termDocTf(corpus, docidCol, textCol)
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(struct(col("docid"), col("tf")))).as("postings"))

  // ---- d-gap + VInt codec (R1/R2) ------------------------------------
  // Same wire format as Hadoop's WritableUtils.writeVLong, the encoding the
  // reference packs postings with (BuildInvertedIndexCompressed.java:125-126).

  private def writeV(out: java.io.DataOutput, v: Long): Unit =
    org.apache.hadoop.io.WritableUtils.writeVLong(out, v)

  /** Encode docid-ascending (docid, tf) postings as d-gap + VInt bytes. */
  val encodePostings: Seq[Row] => Array[Byte] = { postings =>
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    var prev = 0L
    postings.foreach { r =>
      val docid = r.getLong(0)
      writeV(out, docid - prev); writeV(out, r.getLong(1))
      prev = docid
    }
    out.flush(); bos.toByteArray
  }

  /** Decode d-gap + VInt bytes back to (docid, tf) postings. */
  val decodePostings: Array[Byte] => Seq[(Long, Long)] = { bytes =>
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var prev = 0L
    while (in.available() > 0) {
      val gap = org.apache.hadoop.io.WritableUtils.readVLong(in)
      val tf = org.apache.hadoop.io.WritableUtils.readVLong(in)
      prev += gap
      buf += ((prev, tf))
    }
    buf.toSeq
  }

  /** Index with byte-packed postings column — the compressed form. The
    * codec runs as a native expression (graft.functions.PostingsCodec) so
    * the pack stays in whole-stage codegen; the Row-level closures above
    * remain as the spec's reference implementation. */
  def compressedIndex(index: DataFrame): DataFrame =
    index.select(col("term"), col("df"),
      graft.functions.GraftFunctions
        .postingsEncode(index.sparkSession, col("postings")).as("packed"))

  /** Inverse of [[compressedIndex]] (docids reconstructed from d-gaps). */
  def decodeIndex(compressed: DataFrame): DataFrame =
    compressed.select(col("term"), col("df"),
      graft.functions.GraftFunctions
        .postingsDecode(compressed.sparkSession, col("packed")).as("postings"))

  /** Point lookup — S5 (MapFile.get analogue). */
  def lookupPostings(index: DataFrame, term: String): DataFrame =
    index.where(col("term") === term)

  // ---- Hadoop MapFile container (S5/S9 full parity) -------------------
  // The reference stores the compressed index as a MapFile
  // (BuildInvertedIndexCompressed.java:198 MapFileOutputFormat) and serves
  // point lookups with MapFile.Reader.get
  // (LookupPostingsCompressed.java / BooleanRetrievalCompressed.java).
  // These write/read the SAME container, so a reference user's existing
  // index files and tools interoperate with this engine.

  /** Write a compressed index as Hadoop MapFiles (Text -> BytesWritable),
    * one `part-r-NNNNN` MapFile per partition. Parts are RANGE-partitioned
    * on term (each part covers a contiguous, sorted term range), so a point
    * lookup opens exactly one part — unlike the reference's hash
    * partitioning, which must rehash the key to find its part. */
  /** Sidecar file recording each part's [first, last] term range, written
    * by [[writeMapFileIndex]] and used by [[mapFileGet]] to open exactly
    * ONE part per point lookup. One line per part:
    * `part-r-NNNNN \t base64(firstKey) \t base64(lastKey)` (keys as UTF-8
    * bytes — base64 keeps arbitrary term bytes unambiguous in a text
    * line). The reference's MapFileOutputFormat.getEntry does the same
    * single-part selection by re-hashing the key
    * (reference/assignment3/src/main/BooleanRetrievalCompressed.java:42-46
    * opens one reader); range-partitioned parts need the ranges instead. */
  private val rangesSidecar = "_ranges"

  def writeMapFileIndex(compressed: DataFrame, dir: String,
                        numPartitions: Int = 1): Unit = {
    import org.apache.hadoop.io.BytesWritable
    // executors must resolve the SAME filesystem the session would (HDFS/
    // S3/local per fs.defaultFS) — a bare executor-side Configuration()
    // sees whatever core-site happens to be on that classpath. Hadoop
    // Configuration is Writable, not Serializable: ship the entries.
    val confEntries = {
      val hc = compressed.sparkSession.sparkContext.hadoopConfiguration
      val it = hc.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += (e.getKey -> e.getValue) }
      buf.toArray
    }
    // overwrite semantics: clear any previous index first — with the
    // rename-based task commit below, a stale part at the final path would
    // otherwise win against every new attempt
    val dirPath0 = new org.apache.hadoop.fs.Path(dir)
    dirPath0.getFileSystem(compressed.sparkSession.sparkContext.hadoopConfiguration)
      .delete(dirPath0, true)
    val parted =
      if (numPartitions == 1) compressed.coalesce(1).sortWithinPartitions("term")
      else compressed.repartitionByRange(numPartitions, col("term"))
        .sortWithinPartitions("term")
    // each task reports its part's (first, last) term so the driver can
    // write the _ranges sidecar; a CollectionAccumulator rather than a
    // mapPartitions collect keeps the write an action (no second job), and
    // duplicates from speculative attempts are deduped by partition id
    // (the values are identical — same sorted data)
    val ranges = compressed.sparkSession.sparkContext
      .collectionAccumulator[(Int, String, String)]("mapfile-part-ranges")
    parted.select(col("term"), col("packed"))
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val conf = new org.apache.hadoop.conf.Configuration()
          confEntries.foreach { case (k, v) => conf.set(k, v) }
          // Task-commit protocol (a retried or SPECULATIVELY executed task
          // gets the same partition id — two attempts writing the final
          // part path concurrently would interleave into a corrupt
          // MapFile): write to an attempt-unique temp dir, then rename
          // into place. Rename is atomic on HDFS/posix; the losing attempt
          // sees the final path already present and discards its output.
          val finalPath = new org.apache.hadoop.fs.Path(f"$dir/part-r-$pid%05d")
          val tmpDir = new org.apache.hadoop.fs.Path(
            f"$dir/_temporary/attempt-${tc.taskAttemptId()}")
          val tmpPath = new org.apache.hadoop.fs.Path(tmpDir, f"part-r-$pid%05d")
          val fs = finalPath.getFileSystem(conf)
          // uncompressed, like the reference's MapFileOutputFormat default
          // (conf's io.seqfile.compression.type would otherwise sneak
          // RECORD compression in)
          val w = new org.apache.hadoop.io.MapFile.Writer(conf, tmpPath,
            org.apache.hadoop.io.MapFile.Writer.keyClass(classOf[Text]),
            org.apache.hadoop.io.MapFile.Writer.valueClass(classOf[BytesWritable]),
            org.apache.hadoop.io.MapFile.Writer.compression(
              org.apache.hadoop.io.SequenceFile.CompressionType.NONE))
          var first: String = null
          var last: String = null
          try it.foreach { r =>
            val term = r.getString(0)
            if (first == null) first = term
            last = term
            w.append(new Text(term),
              new BytesWritable(r.getAs[Array[Byte]](1)))
          }
          finally w.close()
          ranges.add((pid, first, last))
          // existence check BEFORE the rename: old-API FileSystem.rename
          // moves the source INTO an existing destination directory (and
          // returns true), so a losing attempt renaming onto a committed
          // part would nest junk inside the MapFile dir rather than fail.
          // An already-present finalPath is an already-committed win.
          if (!fs.exists(finalPath)) {
            if (!fs.rename(tmpPath, finalPath) && !fs.exists(finalPath))
              throw new java.io.IOException(
                s"could not commit $tmpPath to $finalPath")
            // exists->rename race: a concurrent winner committing between
            // the check and our rename turns our rename into a move INTO
            // the committed dir — remove the nested junk (reads were never
            // at risk: MapFile.Reader opens finalPath/data|index directly)
            val nested = new org.apache.hadoop.fs.Path(finalPath, tmpPath.getName)
            if (fs.exists(nested)) fs.delete(nested, true)
          }
          fs.delete(tmpDir, true) // no-op when the rename moved it away
          ()
        }
      }
    // drop the attempt scratch space once every partition has committed
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath
      .getFileSystem(compressed.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dirPath, "_temporary"), true)
    // _ranges sidecar: dedupe accumulator entries by pid (a speculative
    // duplicate reports the same range) and record each part's term span
    // so point lookups open one Reader instead of probing every part
    import scala.jdk.CollectionConverters._
    val b64 = java.util.Base64.getEncoder
    def enc(s: String): String = b64.encodeToString(s.getBytes("UTF-8"))
    val lines = ranges.value.asScala.toSeq
      .groupBy(_._1).map(_._2.head).toSeq.sortBy(_._1)
      .map { case (pid, first, last) =>
        f"part-r-$pid%05d\t${enc(first)}\t${enc(last)}" }
    if (lines.nonEmpty) {
      val out = fs.create(new org.apache.hadoop.fs.Path(dirPath, rangesSidecar), true)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** Unsigned byte-wise comparison — the ordering of both Hadoop `Text`
    * and Spark's UTF8String range partitioning, so sidecar range checks
    * agree with how the write side laid terms out (Scala String compare
    * is UTF-16 code-unit order, which DISAGREES beyond the BMP). */
  private def compareUtf8(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** Parts that can contain `term`: with the _ranges sidecar present this
    * is the SINGLE part whose [first, last] span covers the term (or none
    * — the lookup then opens zero readers); without it (an index written
    * by an older version or by the reference's Hadoop job) every part, in
    * order, as the sequential-probe fallback. */
  private[graft] def candidateParts(dir: String, term: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[org.apache.hadoop.fs.Path] = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(conf)
    val sidecar = new org.apache.hadoop.fs.Path(dirPath, rangesSidecar)
    if (fs.exists(sidecar)) {
      val in = fs.open(sidecar)
      val content =
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        finally in.close()
      val b64 = java.util.Base64.getDecoder
      val termBytes = term.getBytes("UTF-8")
      content.split("\n").toSeq.filter(_.nonEmpty).flatMap { line =>
        val Array(part, first, last) = line.split("\t", 3)
        if (compareUtf8(b64.decode(first), termBytes) <= 0 &&
            compareUtf8(termBytes, b64.decode(last)) <= 0)
          Some(new org.apache.hadoop.fs.Path(dirPath, part))
        else None
      }
    } else
      fs.listStatus(dirPath).map(_.getPath)
        .filter(_.getName.startsWith("part-")).sortBy(_.getName).toSeq
  }

  /** MapFile.get point lookup across the part files — decodes the packed
    * postings back to (docid, tf) pairs. Driver-side by design: this is
    * the interactive lookup tool (S5), not a distributed operator. */
  def mapFileGet(dir: String, term: String,
                 conf: org.apache.hadoop.conf.Configuration =
                   org.apache.spark.sql.SparkSession.active
                     .sparkContext.hadoopConfiguration): Option[Seq[(Long, Long)]] = {
    import org.apache.hadoop.io.BytesWritable
    // range-pruned: the _ranges sidecar (written alongside the parts)
    // selects the ONE range-partitioned part that can hold the term, so a
    // point lookup opens exactly one Reader — O(1) in the part count, like
    // the reference's MapFileOutputFormat.getEntry partition hash. Falls
    // back to probing parts in order only when no sidecar exists.
    val key = new Text(term)
    val value = new BytesWritable()
    candidateParts(dir, term, conf).iterator.flatMap { p =>
      val r = new org.apache.hadoop.io.MapFile.Reader(p, conf)
      try Option(r.get(key, value)).map(_ =>
        decodePostings(java.util.Arrays.copyOf(value.getBytes, value.getLength)))
      finally r.close()
    }.nextOption()
  }

  /** tf-value histogram for one term's postings — A7/R4. */
  def tfHistogram(termDocTf: DataFrame, term: String): DataFrame =
    termDocTf.where(col("term") === term)
      .groupBy("tf").agg(count(lit(1)).as("cnt")).orderBy("tf")

  /** TF-IDF scores per (term, doc): tf * ln(N/df) — the classic weighting,
    * turning the boolean index into a ranked one. Marginals (df) broadcast. */
  def tfidf(corpus: DataFrame, docidCol: String, textCol: String): DataFrame = {
    val tdf = termDocTf(corpus, docidCol, textCol)
    val n = corpus.count()
    val dfs = tdf.groupBy("term").agg(count(lit(1)).as("df"))
    tdf.join(broadcast(dfs), "term")
      .select(col("term"), col("docid"), col("tf"),
        (col("tf") * log(lit(n.toDouble) / col("df"))).as("tfidf"))
  }

  /** BM25 scores per (term, doc) — Robertson/Sparck-Jones with the
    * +1 idf variant (never negative): doc length dl is derived from the
    * SAME tf relation (sum of tf per doc == token count), so no second
    * corpus scan; avgdl is one driver scalar.
    */
  def bm25(corpus: DataFrame, docidCol: String, textCol: String,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // localCheckpoint: reused by dfs/docLens/avgdl/final join, and cleaned
    // when unreferenced (persist would leak a CacheManager entry per call)
    val tdf = termDocTf(corpus, docidCol, textCol).localCheckpoint()
    val n = corpus.count()
    val dfs = tdf.groupBy("term").agg(count(lit(1)).as("df"))
    val docLens = tdf.groupBy("docid").agg(sum(col("tf")).as("dl"))
    val avgdl = docLens.agg(avg(col("dl"))).head().getDouble(0)
    val idf = log(lit(1.0) +
      (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl)))
    tdf.join(broadcast(dfs), "term").join(docLens, "docid")
      .select(col("term"), col("docid"), col("tf"),
        (idf * tfNorm).as("bm25"))
  }

  /** Ranked retrieval: top-k docs by summed BM25 over the query terms. */
  def searchBM25(corpus: DataFrame, docidCol: String, textCol: String,
                 queryTerms: Seq[String], k: Int): DataFrame =
    bm25(corpus, docidCol, textCol)
      .where(col("term").isin(queryTerms: _*))
      .groupBy("docid").agg(round(sum(col("bm25")), 6).as("score"))
      .orderBy(col("score").desc, col("docid").asc)
      .limit(k)

  /** RPN boolean retrieval — R3/J3. Tokens are terms or AND/OR; terms push
    * their docid relation, AND pops two and intersects, OR pops two and
    * unions. The stack lives in the driver (exactly like the reference's,
    * BooleanRetrievalCompressed.java:47-66) but every operand is a
    * distributed relation and the set ops are Spark `intersect`/`union`.
    */
  def booleanRetrieve(termDocTf: DataFrame, rpn: Seq[String]): DataFrame = {
    var stack = List.empty[DataFrame]
    def docsOf(t: String): DataFrame =
      termDocTf.where(col("term") === t).select(col("docid"))
    rpn.foreach {
      case "AND" =>
        val (b :: a :: rest) = stack: @unchecked
        stack = a.intersect(b) :: rest
      case "OR" =>
        val (b :: a :: rest) = stack: @unchecked
        stack = a.union(b).distinct() :: rest
      case term => stack = docsOf(term) :: stack
    }
    require(stack.size == 1, s"malformed RPN query: $rpn")
    stack.head.orderBy("docid")
  }

  /** Retrieval with source lines attached — S6 (the reference's raw-file
    * seek becomes a join against the offset-keyed corpus). */
  def booleanRetrieveWithLines(corpus: DataFrame, docidCol: String, textCol: String,
                               rpn: Seq[String]): DataFrame = {
    val hits = booleanRetrieve(termDocTf(corpus, docidCol, textCol), rpn)
    hits.join(corpus.withColumnRenamed(docidCol, "docid"), "docid")
      .select(col("docid"), col(textCol)).orderBy("docid")
  }
}
