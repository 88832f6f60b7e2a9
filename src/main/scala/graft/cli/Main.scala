package graft.cli

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CLI mirroring the reference's tool surface — one subcommand per driver
  * class (reference runs `hadoop jar ... ToolName -input -output ...`;
  * here `runMain graft.cli.Main <tool> --input ... --output ...`).
  *
  * | reference tool                          | subcommand            |
  * |-----------------------------------------|-----------------------|
  * | WordCount (a2)                          | wordcount             |
  * | BigramCount (a2)                        | bigrams               |
  * | ComputeCooccurrenceMatrixPairs (a2)     | cooc-pairs            |
  * | ComputeCooccurrenceMatrixStripes (a2)   | cooc-stripes          |
  * | PairsPMI / StripesPMI (a2)              | pmi                   |
  * | BuildInvertedIndexCompressed (a3)       | build-index           |
  * | LookupPostingsCompressed (a3)           | lookup-postings       |
  * | BooleanRetrievalCompressed (a3)         | boolean-retrieval     |
  * | RunPageRankBasic + FindMax... (a4)      | pagerank              |
  * | RunPersonalizedPageRank + ExtractTop (a4)| personalized-pagerank|
  * | ExtractHourlyCountsAll/Egypt (a6)       | hourly-counts         |
  *
  * Output is TSV part files (the reference's text-sink shape, S7) with
  * overwrite-before-run semantics (S10).
  */
object Main {

  private def parseArgs(args: Array[String]): (String, Map[String, String]) = {
    require(args.nonEmpty, usage)
    val opts = args.tail.sliding(2, 2).map {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
      case Array(k, v) =>
        throw new IllegalArgumentException(s"expected --flag, got '$k $v'\n$usage")
      case Array(k) =>
        throw new IllegalArgumentException(s"flag '$k' is missing a value\n$usage")
    }.toMap
    (args.head, opts)
  }

  private val usage =
    """usage: graft.cli.Main <tool> --input PATH --output PATH [options]
      |tools: wordcount bigrams cooc-pairs cooc-stripes pmi build-index
      |       lookup-postings boolean-retrieval pagerank
      |       personalized-pagerank hourly-counts graph-stats
      |       split contamination dedup-clusters sample-exact
      |       curate (--min-tokens N --benchmark PATH
      |               --max-contamination F --resample g=w,... --group-col C
      |               --quality-model DIR --min-prob F)
      |       dedup-index (build the between-snapshots (id, fp, hs) index)
      |       dedup-incremental (--index DIR | --corpus PATH)
      |       quality-train (--label '<bool sql>' --dims N --iterations N)
      |       quality-score (--model DIR)
      |       vocab-induce (--max-piece-len N --top-k N)
      |       subword-count (--vocab DIR)
      |       corpus-card (--group-cols a,b: corpus datasheet JSON + mixture)
      |       media-features (--kind image|audio --bytes COL: JDK decode
      |                       -> thumbnail embeddings / RMS envelopes)
      |       video-meta (--bytes COL: ISO-BMFF box walk -> duration/
      |                   tracks/codec/dimensions container metadata)
      |       video-frames (--bytes COL: AVI movi walk + per-frame
      |                     MJPG/MPNG decode -> dims + pixel mean)
      |       ann-topk (--method brute|lsh|ivf|pq|ivfpq --queries PATH --k N
      |                 --model PATH: probe a stored model)
      |       ann-build (--method ivf|pq|ivfpq: train + persist quantizers)
      |       compact compact-manifest vacuum-manifest show-manifest
      |       count-manifest delete-manifest history-manifest
      |       rollback-manifest (--to-generation N | --as-of ISO)
      |       show-manifest (--as-of ISO)
      |                             (pipeline extensions over parquet)
      |options: --window N --min-count N --iterations N --alpha F
      |         --sources a,b --top K --term T --query "x y AND"
      |         --mapfile DIR (build-index: also write the MapFile container,
      |           --num-parts N parts; lookup-postings: serve from it)
      |         --collection PATH (boolean-retrieval corpus; defaults to --input)
      |         --egypt true --partitions N
      |         --key COL --train N --valid N          (split)
      |         --benchmark PATH --id COL --text COL --shingle-n N
      |         --bloom-bits N (contamination; bloom path when set)
      |         --threshold F --minhash-k N --bands N  (dedup-clusters)
      |         --class COL --key COL --k N            (sample-exact)
      |         --stats-cols a,b --cluster-by a,b      (compact-manifest)
      |         --only-smaller-than BYTES   (compact-manifest: incremental)
      |         --bound-type long|double|string|date|timestamp
      |                  (count-manifest/delete-manifest --lower/--upper;
      |                   default: the manifest's recorded stats tag)""".stripMargin

  def main(args: Array[String]): Unit = {
    val (cmd, opts) = parseArgs(args)
    val parts = opts.getOrElse("partitions", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[*]"))
      .appName(s"graft-$cmd")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, cmd, opts)
    finally spark.stop()
  }

  /** Type a CLI `--lower`/`--upper` value for a manifest bound. Priority:
    * an explicit `--bound-type` (long|double|string|date|timestamp), else
    * the stats tag the table's manifest recorded for the column ("l"/"d"/
    * "s" — dates travel as ISO strings, so "s" just passes the text
    * through), else long → double → string inference. A value that fails
    * its declared type is a friendly error, not a NumberFormatException
    * stack trace. */
  private[graft] def parseBound(spark: SparkSession, table: String,
      colName: String, raw: String, boundType: Option[String]): Any = {
    def fail(t: String): Nothing = throw new IllegalArgumentException(
      s"--lower/--upper value '$raw' is not a valid $t for column " +
        s"'$colName' (override with --bound-type long|double|string|date|timestamp)")
    boundType.orElse(LayoutOps.manifestStatsTag(spark, table, colName).map {
      case "l" => "long"
      case "d" => "double"
      case _   => "string"
    }) match {
      case Some("long")   => raw.toLongOption.getOrElse(fail("long"))
      case Some("double") => raw.toDoubleOption.getOrElse(fail("double"))
      case Some("string") => raw
      case Some("date") =>
        try java.sql.Date.valueOf(raw)
        catch { case _: IllegalArgumentException => fail("date (yyyy-mm-dd)") }
      case Some("timestamp") =>
        try java.sql.Timestamp.valueOf(raw)
        catch { case _: IllegalArgumentException =>
          fail("timestamp (yyyy-mm-dd hh:mm:ss)") }
      case Some(other) => throw new IllegalArgumentException(
        s"unknown --bound-type '$other' (long|double|string|date|timestamp)")
      case None =>
        raw.toLongOption.map(identity[Any])
          .orElse(raw.toDoubleOption).getOrElse(raw)
    }
  }

  private[graft] def run(spark: SparkSession, cmd: String,
                         opts: Map[String, String]): Unit = {
    def in = opts("input")
    def out = opts("output")
    def text = spark.read.text(in) // gzip-transparent, like TextInputFormat
    def writeTsv(df: DataFrame): Unit =
      df.write.mode("overwrite").option("sep", "\t").csv(out)

    cmd match {
      case "wordcount" =>
        writeTsv(TextOps.wordCount(text, "value"))
      case "bigrams" =>
        writeTsv(TextOps.bigramCount(text, "value"))
      case "cooc-pairs" =>
        writeTsv(TextOps.coocPairs(text, "value",
          opts.getOrElse("window", "2").toInt))
      case "cooc-stripes" =>
        // map column rendered as sorted "k:v,k:v" text for the TSV sink
        writeTsv(TextOps.coocStripes(text, "value",
            opts.getOrElse("window", "2").toInt)
          .select(col("term"), concat_ws(",", transform(
            map_entries(col("stripe")),
            e => concat(e.getField("key"), lit(":"), e.getField("value"))))))
      case "pmi" =>
        // doc_id only marks line identity within this run; PMI depends on
        // per-line term SETS, never on the id values, so the synthetic id
        // is safe (ids are a pure function of partition + offset)
        val docs = text.withColumn("doc_id", monotonically_increasing_id())
        writeTsv(TextOps.pmi(docs, "doc_id", "value",
          opts.getOrElse("min-count", "10").toInt)
          .select(col("x"), col("y"), round(col("pmi"), 6)))
      case "build-index" =>
        val corpus = IndexOps.corpusWithOffsets(spark, in)
        val compressed =
          IndexOps.compressedIndex(IndexOps.invertedIndex(corpus, "docid", "text"))
        compressed.write.mode("overwrite").parquet(out)
        // --mapfile DIR additionally writes the reference's MapFile
        // container; --num-parts is the reference's -numReducers analogue
        // (part count of the term-range-partitioned MapFile output).
        // Fed from the parquet just written, NOT from `compressed` — the
        // tokenize+groupBy+encode pipeline would otherwise run a second
        // time for the container write.
        opts.get("mapfile").foreach(IndexOps.writeMapFileIndex(
          spark.read.parquet(out), _, opts.getOrElse("num-parts", "1").toInt))
      case "lookup-postings" =>
        val term = opts("term")
        // --mapfile DIR serves the lookup through MapFile.Reader.get on the
        // reference container (IndexOps.mapFileGet) instead of the parquet
        // index; df == postings length by construction in both stores
        val postings: Option[(Long, Seq[(Long, Long)])] = opts.get("mapfile") match {
          case Some(dir) =>
            IndexOps.mapFileGet(dir, term, spark.sparkContext.hadoopConfiguration)
              .map(ps => (ps.length.toLong, ps))
          case None =>
            val idx = IndexOps.decodeIndex(spark.read.parquet(in))
            IndexOps.lookupPostings(idx, term).collect().headOption.map { r =>
              (r.getLong(1), r.getSeq[org.apache.spark.sql.Row](2)
                .map(p => (p.getLong(0), p.getLong(1))).toSeq)
            }
        }
        postings match {
          case None => println(s"the term $term does not appear in the collection")
          case Some((df, ps)) =>
            println(s"Complete postings list for '$term': ($df, " +
              ps.map(p => s"(${p._1}, ${p._2})").mkString("[", ", ", "]") + ")")
        }
      case "boolean-retrieval" =>
        // --collection is the raw corpus (reference's -collection flag);
        // fall back to --input so the documented flags alone work
        val corpus = IndexOps.corpusWithOffsets(spark,
          opts.getOrElse("collection", in))
        val rpn = opts("query").split("\\s+").toSeq
        IndexOps.booleanRetrieveWithLines(corpus, "docid", "text", rpn)
          .collect().foreach(r => println(s"${r.getLong(0)}\t${r.getString(1)}"))
      case "pagerank" =>
        val (edges, verts) = GraphOps.edgesFromAdjacencyText(text)
        val ranks = GraphOps.pageRank(edges,
          opts.getOrElse("iterations", "20").toInt,
          opts.getOrElse("alpha", "0.15").toDouble,
          vertices = Some(verts), dedupeEdges = false)
        writeTsv(GraphOps.topK(ranks, opts.getOrElse("top", "10").toInt)
          .select(format_string("%.5f", col("rank")).as("rank"), col("nodeid")))
      case "personalized-pagerank" =>
        val (edges, verts) = GraphOps.edgesFromAdjacencyText(text)
        val sources = opts("sources").split(",").map(_.trim.toLong).toSeq
        val ranks = GraphOps.personalizedPageRank(edges, sources,
          opts.getOrElse("iterations", "20").toInt,
          opts.getOrElse("alpha", "0.15").toDouble,
          vertices = Some(verts), dedupeEdges = false)
        // reference rendering: "%.5f %d" per source, rank-descending
        // (ExtractTopPersonalizedPageRankNodes.java:112)
        writeTsv(GraphOps.topKPerSource(ranks, opts.getOrElse("top", "10").toInt)
          .select(col("source"), col("rn"),
            format_string("%.5f", col("rank")).as("rank"), col("nodeid")))
      case "graph-stats" =>
        val (edges, verts) = GraphOps.edgesFromAdjacencyText(text)
        GraphOps.graphStats(edges, Some(verts)).toSeq.sortBy(_._1)
          .foreach { case (k, v) => println(s"$k\t$v") }
      // ---- pipeline extensions (beyond the reference tool surface) ----
      case "split" =>
        // label a parquet table with a deterministic train/valid/test split
        val key = opts.getOrElse("key", "id")
        spark.read.parquet(in)
          .withColumn("split", PipelineOps.splitLabel(col(key),
            opts.getOrElse("train", "80").toInt, opts.getOrElse("valid", "10").toInt))
          .write.mode("overwrite").parquet(out)
      case "contamination" =>
        val corpus = spark.read.parquet(in)
        val bench = spark.read.parquet(opts.getOrElse("benchmark",
          throw new IllegalArgumentException(
            s"contamination requires --benchmark PATH\n$usage")))
        val id = opts.getOrElse("id", "doc_id")
        val text = opts.getOrElse("text", "text")
        val n = opts.getOrElse("shingle-n", "3").toInt
        // --bloom-bits switches to the bounded-memory bloom path (for
        // benchmark sides too big to broadcast as an exact set)
        (opts.get("bloom-bits") match {
          case Some(bits) =>
            PipelineOps.bloomContamination(corpus, bench, id, text, n,
              numBits = bits.toInt)
          case None => PipelineOps.contamination(corpus, bench, id, text, n)
        }).write.mode("overwrite").parquet(out)
      case "ann-topk" =>
        // embedding top-k: --method picks the path (brute = exact
        // baseline; lsh/ivf/pq = the bucketed/compressed scale paths);
        // --queries defaults to the corpus' first 3 ids
        val corpus = spark.read.parquet(in)
        val id = opts.getOrElse("id", "vec_id")
        val vec = opts.getOrElse("vec", "embedding")
        val queries = opts.get("queries").map(spark.read.parquet(_))
          .getOrElse(corpus.orderBy(col(id)).limit(3))
        val k = opts.getOrElse("k", "5").toInt
        (opts.getOrElse("method", "brute") match {
          case "brute" => SimilarityOps.bruteForceTopK(
            corpus, id, vec, queries, id, vec, k)
          case "lsh" => SimilarityOps.lshTopK(corpus, id, vec,
            queries, id, vec, k,
            planes = opts.getOrElse("planes", "4").toInt,
            probeBits = opts.getOrElse("probe-bits", "0").toInt)
          case "ivf" => SimilarityOps.ivfTopK(corpus, id, vec,
            queries, id, vec, k,
            nlist = opts.getOrElse("nlist", "16").toInt,
            nprobe = opts.getOrElse("nprobe", "4").toInt,
            centroids = opts.get("model")
              .map(SimilarityOps.loadIvfModel(spark, _)))
          case "pq" => SimilarityOps.pqTopK(corpus, id, vec,
            queries, id, vec, k,
            m = opts.getOrElse("m", "2").toInt,
            cells = opts.getOrElse("cells", "16").toInt,
            iterations = opts.getOrElse("iterations", "2").toInt,
            codebooks = opts.get("model")
              .map(SimilarityOps.loadPqModel(spark, _)))
          case "ivfpq" => SimilarityOps.ivfPqTopK(corpus, id, vec,
            queries, id, vec, k,
            nlist = opts.getOrElse("nlist", "8").toInt,
            nprobe = opts.getOrElse("nprobe", "2").toInt,
            m = opts.getOrElse("m", "2").toInt,
            cells = opts.getOrElse("cells", "4").toInt,
            iterations = opts.getOrElse("iterations", "2").toInt,
            centroids = opts.get("model")
              .map(m => SimilarityOps.loadIvfModel(spark, s"$m/ivf")),
            codebooks = opts.get("model")
              .map(m => SimilarityOps.loadPqModel(spark, s"$m/pq")))
          case other => throw new IllegalArgumentException(
            s"unknown --method '$other' (brute|lsh|ivf|pq|ivfpq)")
        }).write.mode("overwrite").parquet(out)
      case "ann-build" =>
        // train an ANN quantizer ONCE and persist it as a manifested model
        // table; `ann-topk --model PATH` then probes without retraining.
        // --method ivf writes (cell, v); --method pq writes
        // (subspace, cell, v)
        val corpus = spark.read.parquet(in)
        val id = opts.getOrElse("id", "vec_id")
        val vec = opts.getOrElse("vec", "embedding")
        opts.getOrElse("method", "ivf") match {
          case "ivf" =>
            val cents = SimilarityOps.trainIvfCentroids(corpus, id, vec,
              nlist = opts.getOrElse("nlist", "16").toInt,
              iterations = opts.getOrElse("iterations", "2").toInt,
              roundDecimals = Some(6))
            SimilarityOps.saveIvfModel(spark, cents, out)
            println(s"ivf model: ${cents.length} centroids -> $out")
          case "pq" =>
            val books = SimilarityOps.trainPqCodebooks(corpus, id, vec,
              m = opts.getOrElse("m", "2").toInt,
              cells = opts.getOrElse("cells", "16").toInt,
              iterations = opts.getOrElse("iterations", "2").toInt)
            SimilarityOps.savePqModel(spark, books, out)
            println(s"pq model: ${books.length} subspaces x " +
              s"${books.headOption.map(_.length).getOrElse(0)} cells -> $out")
          case "ivfpq" =>
            // both quantizers: coarse centroids under <out>/ivf, residual
            // codebooks under <out>/pq — exactly what ann-topk
            // --method ivfpq --model <out> loads
            val iters = opts.getOrElse("iterations", "2").toInt
            val cents = SimilarityOps.trainIvfCentroids(corpus, id, vec,
              nlist = opts.getOrElse("nlist", "8").toInt,
              iterations = iters, roundDecimals = Some(6))
            SimilarityOps.saveIvfModel(spark, cents, s"$out/ivf")
            val books = SimilarityOps.trainPqResidualCodebooks(corpus, id,
              vec, cents, m = opts.getOrElse("m", "2").toInt,
              cells = opts.getOrElse("cells", "4").toInt,
              iterations = iters)
            SimilarityOps.savePqModel(spark, books, s"$out/pq")
            println(s"ivfpq model: ${cents.length} cells + " +
              s"${books.length} subspace codebooks -> $out")
          case other => throw new IllegalArgumentException(
            s"unknown --method '$other' (ivf|pq|ivfpq)")
        }
      case "dedup-clusters" =>
        // near-dup clustering: (doc_id, cluster_id, is_canonical) over the
        // docs that appear in a near-dup pair. To dedup a corpus, ANTI-join
        // the non-canonical rows (keeping only is_canonical would drop
        // every unpaired doc — they are absent from this table)
        DedupOps.nearDupClusters(spark.read.parquet(in),
          opts.getOrElse("id", "doc_id"), opts.getOrElse("text", "text"),
          opts.getOrElse("shingle-n", "3").toInt,
          opts.getOrElse("minhash-k", "12").toInt,
          opts.getOrElse("bands", "4").toInt,
          opts.getOrElse("threshold", "0.5").toDouble)
          .write.mode("overwrite").parquet(out)
      case "media-features" =>
        // REAL JDK decode -> feature parquet: --kind image emits 8x8
        // thumbnail embeddings (ANN-ready), --kind audio emits windowed
        // RMS loudness envelopes; undecodable rows are dropped
        val assets = MultimodalOps.asAssets(spark.read.parquet(in),
          opts.getOrElse("id", "asset_id"),
          opts.getOrElse("bytes", "content"),
          opts.getOrElse("kind", "image"))
        (opts.getOrElse("kind", "image") match {
          case "image" => MultimodalOps.imageThumbnailFeatures(assets,
            side = opts.getOrElse("side", "8").toInt)
          case "audio" => MultimodalOps.audioEnergyFeatures(assets,
            windows = opts.getOrElse("windows", "8").toInt)
          case other => throw new IllegalArgumentException(
            s"unknown --kind '$other' (image|audio)")
        }).toDF().select(col("asset_id"), col("feature"))
          .write.mode("overwrite").parquet(out)
      case "video-meta" =>
        // REAL ISO-BMFF box walk -> container metadata parquet: the
        // duration/tracks/codec/dimensions a pipeline filters video on
        // before decoding; corrupt payloads keep sentinel rows
        MultimodalOps.videoContainerMeta(
          MultimodalOps.asAssets(spark.read.parquet(in),
            opts.getOrElse("id", "asset_id"),
            opts.getOrElse("bytes", "content"), "video/mp4"))
          .toDF().write.mode("overwrite").parquet(out)
      case "video-frames" =>
        // REAL frame decode for frame-coded AVI (MJPG/MPNG): RIFF movi
        // walk + per-frame still decode -> one row per frame with
        // dimensions and pixel mean; unparseable containers keep one
        // sentinel row, bad frames keep per-frame sentinels
        MultimodalOps.decodeVideoFrames(
          MultimodalOps.asAssets(spark.read.parquet(in),
            opts.getOrElse("id", "asset_id"),
            opts.getOrElse("bytes", "content"), "video/x-msvideo"))
          .toDF().write.mode("overwrite").parquet(out)
      case "corpus-card" =>
        // one-stop corpus report (the "datasheet" a pipeline operator
        // checks before training): size, token volume, exact-dup rate,
        // length quantiles, and the source x lang mixture table
        val d = spark.read.parquet(in)
        val text = opts.getOrElse("text", "text")
        val groupCols = opts.get("group-cols").map(_.split(",").toSeq)
          .getOrElse(Seq("source", "lang").filter(d.columns.contains))
        val stats = d.agg(
          count(lit(1)).as("docs"),
          sum(size(TextOps.tokens(col(text)))).as("tokens"),
          sum(length(col(text))).as("chars"),
          countDistinct(md5(col(text))).as("distinct_texts")).head()
        val docs = stats.getLong(0)
        val lenQ = d.select(size(TextOps.tokens(col(text))).cast("double")
            .as("nt"))
          .stat.approxQuantile("nt", Array(0.1, 0.5, 0.9), 0.001)
        if (groupCols.nonEmpty && docs > 0)
          CurationOps.mixtureReport(d, text, groupCols)
            .write.mode("overwrite").parquet(s"$out/mixture")
        val dupRate =
          if (docs == 0) 0.0 else 1.0 - stats.getLong(3).toDouble / docs
        def q(i: Int): Double = if (lenQ.length > i) lenQ(i) else 0.0
        val tokens = if (docs == 0) 0L else stats.getLong(1)
        val chars = if (docs == 0) 0L else stats.getLong(2)
        println(s"""{"docs":$docs,"tokens":$tokens,"chars":$chars,""" +
          f""""exact_dup_rate":$dupRate%.6f,""" +
          s""""len_p10":${q(0)},"len_p50":${q(1)},"len_p90":${q(2)}}""")
      case "vocab-induce" =>
        // subword seed-vocabulary induction -> (piece, cnt, rank) parquet
        TextAnalysisOps.vocabInduction(spark.read.parquet(in),
          opts.getOrElse("text", "text"),
          maxPieceLen = opts.getOrElse("max-piece-len", "4").toInt,
          topK = opts.getOrElse("top-k", "1000").toInt)
          .write.mode("overwrite").parquet(out)
      case "subword-count" =>
        // per-doc subword counts under --vocab (a vocab-induce output)
        val vocab = spark.read.parquet(opts.getOrElse("vocab",
          throw new IllegalArgumentException(
            s"subword-count needs --vocab DIR (from vocab-induce)\n$usage")))
        TextAnalysisOps.subwordTokenCounts(spark.read.parquet(in),
          opts.getOrElse("id", "doc_id"), opts.getOrElse("text", "text"),
          vocab, maxPieceLen = opts.getOrElse("max-piece-len", "4").toInt)
          .write.mode("overwrite").parquet(out)
      case "quality-train" =>
        // train the learned quality filter on a labeled seed set
        // (--label is a boolean SQL expression over the input's columns,
        // e.g. "lang = 'en'" or "source = 'wiki'") and persist the
        // weights as a manifested model table
        val label = opts.getOrElse("label", throw new IllegalArgumentException(
          s"quality-train needs --label '<boolean sql expr>'\n$usage"))
        val w = ClassifierOps.trainLogReg(spark.read.parquet(in),
          opts.getOrElse("id", "doc_id"), opts.getOrElse("text", "text"),
          expr(label), dims = opts.getOrElse("dims", "64").toInt,
          iterations = opts.getOrElse("iterations", "10").toInt,
          lr = opts.getOrElse("lr", "1.0").toDouble)
        ClassifierOps.saveModel(spark, w, out)
        println(s"quality model: ${w.length - 1} buckets + bias -> $out")
      case "quality-score" =>
        // sweep a corpus under a stored quality model: (id, prob)
        val model = opts.getOrElse("model", throw new IllegalArgumentException(
          s"quality-score needs --model DIR (from quality-train)\n$usage"))
        ClassifierOps.scoreLogReg(spark.read.parquet(in),
          opts.getOrElse("id", "doc_id"), opts.getOrElse("text", "text"),
          ClassifierOps.loadModel(spark, model))
          .write.mode("overwrite").parquet(out)
      case "dedup-index" =>
        // build the between-snapshots dedup index: one (id, fp, hs) row
        // per distinct corpus text, committed as a manifested table
        LayoutOps.writeManifested(
          DedupOps.corpusDedupIndex(spark.read.parquet(in),
            opts.getOrElse("id", "doc_id"), opts.getOrElse("text", "text"),
            opts.getOrElse("shingle-n", "3").toInt), out)
        println(s"dedup index -> $out")
      case "dedup-incremental" =>
        // classify an incoming batch exact/near/new against --index (a
        // stored dedup-index table) or --corpus (raw docs, index computed
        // on the fly)
        val incoming = spark.read.parquet(in)
        val id = opts.getOrElse("id", "doc_id")
        val text = opts.getOrElse("text", "text")
        val shingleN = opts.getOrElse("shingle-n", "3").toInt
        val k = opts.getOrElse("minhash-k", "12").toInt
        val bands = opts.getOrElse("bands", "4").toInt
        val thr = opts.getOrElse("threshold", "0.5").toDouble
        (opts.get("index"), opts.get("corpus")) match {
          case (Some(idx), _) =>
            DedupOps.dedupAgainstIndex(LayoutOps.readManifested(spark, idx),
              incoming, id, text, shingleN, k, bands, thr)
              .write.mode("overwrite").parquet(out)
          case (None, Some(corpus)) =>
            DedupOps.dedupAgainstCorpus(spark.read.parquet(corpus),
              incoming, id, text, shingleN, k, bands, thr)
              .write.mode("overwrite").parquet(out)
          case _ => throw new IllegalArgumentException(
            "dedup-incremental needs --index DIR (stored dedup-index) " +
              s"or --corpus PATH (raw docs)\n$usage")
        }
      case "curate" =>
        // end-to-end corpus curation: exact dedup -> near-dup clusters ->
        // quality floor -> benchmark decontamination -> optional mixture
        // resample. Survivors land in <out>/docs; <out>/report is a TSV
        // audit trail (docs surviving each stage) — the number a pipeline
        // operator reads first when a run looks wrong.
        val targets = opts.get("resample").map(_.split(",").map { kv =>
          kv.split("=", 2) match {
            case Array(g, w) if g.nonEmpty && w.nonEmpty =>
              val wd = try w.toDouble catch {
                case _: NumberFormatException =>
                  throw new IllegalArgumentException(
                    s"--resample weight '$w' in '$kv' is not a number" +
                      s"\n$usage")
              }
              g -> wd
            case _ => throw new IllegalArgumentException(
              s"--resample expects group=weight[,group=weight...], " +
                s"got '$kv'\n$usage")
          }
        }.toMap).getOrElse(Map.empty[String, Double])
        val (kept, stages) = CurationOps.curate(spark.read.parquet(in),
          opts.getOrElse("id", "doc_id"), opts.getOrElse("text", "text"),
          minTokens = opts.get("min-tokens").map(_.toInt),
          benchmark = opts.get("benchmark").map(spark.read.parquet(_)),
          maxContamination =
            opts.getOrElse("max-contamination", "0.5").toDouble,
          resampleTargets = targets,
          resampleGroupCol = opts.getOrElse("group-col", "source"),
          shingleN = opts.getOrElse("shingle-n", "3").toInt,
          minhashK = opts.getOrElse("minhash-k", "12").toInt,
          bands = opts.getOrElse("bands", "4").toInt,
          threshold = opts.getOrElse("threshold", "0.5").toDouble,
          qualityModel = opts.get("quality-model").map(m =>
            (ClassifierOps.loadModel(spark, m),
              opts.getOrElse("min-prob", "0.5").toDouble)))
        kept.write.mode("overwrite").parquet(s"$out/docs")
        import spark.implicits._
        stages.toDF("stage", "n_docs").coalesce(1)
          .write.option("sep", "\t").mode("overwrite").csv(s"$out/report")
        stages.foreach { case (s, n) => println(s"$s\t$n") }
      // ---- table-maintenance tools (layout operators) ----
      case "compact" =>
        // posix/HDFS rename-swap compaction; refuses object-store schemes
        val n = LayoutOps.compact(spark, in,
          opts.getOrElse("target-bytes", (128L * 1024 * 1024).toString).toLong)
        println(s"compacted $in to $n files")
      case "compact-manifest" =>
        // --stats-cols overrides the (otherwise inherited) stats columns;
        // --cluster-by re-sorts so file ranges are disjoint again;
        // --zorder-by x,y converts/re-declares a 2-D Morton layout
        val n = LayoutOps.compactManifest(spark, in,
          opts.getOrElse("target-bytes", (128L * 1024 * 1024).toString).toLong,
          statsCols = opts.get("stats-cols").map(_.split(",").toSeq),
          clusterBy = opts.get("cluster-by")
            .map(_.split(",").toSeq).getOrElse(Nil),
          onlyFilesSmallerThan = opts.get("only-smaller-than")
            .map(_.toLong).getOrElse(Long.MaxValue),
          zOrderBy = opts.get("zorder-by")
            .map(_.split(",").toSeq).getOrElse(Nil))
        println(s"committed compacted generation of $in with $n files")
      case "vacuum-manifest" =>
        // --keep-history K retains the newest K+1 generations readable
        val n = LayoutOps.vacuumManifested(spark, in,
          opts.getOrElse("keep-history", "0").toInt)
        println(s"vacuumed $n superseded data files from $in")
      case "count-manifest" =>
        // metadata-only count; --col/--lower/--upper add an inclusive range
        // (bound values typed from --bound-type, else the manifest's
        // recorded stats tag, else long -> double -> string inference)
        val bounds = opts.get("col").toSeq.map(c => LayoutOps.ColBounds(c,
          opts.get("lower").map(parseBound(spark, in, c, _, opts.get("bound-type"))),
          opts.get("upper").map(parseBound(spark, in, c, _, opts.get("bound-type")))))
        val (n, scanned) = LayoutOps.countManifestedWhere(spark, in, bounds)
        println(s"$n rows ($scanned of the listed files scanned)")
      case "delete-manifest" =>
        // copy-on-write range delete on --col between --lower and --upper
        val c = opts("col")
        val (rw, carried) = LayoutOps.deleteManifestedWhere(spark, in,
          Seq(LayoutOps.ColBounds(c,
            opts.get("lower").map(parseBound(spark, in, c, _, opts.get("bound-type"))),
            opts.get("upper").map(parseBound(spark, in, c, _, opts.get("bound-type"))))))
        println(s"rewrote $rw files, carried $carried untouched")
      case "history-manifest" =>
        // commit log: one line per retained generation with op provenance
        LayoutOps.historyManifested(spark, in).foreach(println)
      case "rollback-manifest" =>
        // metadata-only undo: re-commit an old generation's listing as
        // new; the target is --to-generation N or --as-of <ISO instant>
        if (opts.get("to-generation").isEmpty && opts.get("as-of").isEmpty)
          throw new IllegalArgumentException(
            "rollback-manifest needs a target: --to-generation N | --as-of <ISO instant>")
        val target = opts.get("to-generation").map(_.toLong).getOrElse(
          LayoutOps.generationAsOf(spark, in,
            java.time.Instant.parse(opts("as-of")).toEpochMilli))
        val g = LayoutOps.rollbackManifested(spark, in, target)
        println(s"rolled $in back to generation $target " +
          s"(committed as generation $g)")
      case "show-manifest" =>
        // inspection: generation, schema, and each file's skip stats;
        // --as-of <ISO instant> time-travels to the generation committed
        // at or before that instant
        val gen = opts.get("as-of").map(ts => LayoutOps.generationAsOf(
          spark, in, java.time.Instant.parse(ts).toEpochMilli))
        val (kept, total) = LayoutOps.manifestSkipFiles(spark, in, Nil, gen)
        println(s"$in: $total data files in " +
          gen.map(g => s"generation $g").getOrElse("the current generation"))
        LayoutOps.describeManifest(spark, in, gen).foreach(println)
        require(kept.size == total) // no bounds → nothing pruned
      case "sample-exact" =>
        // exact-k deterministic per-class sample
        PipelineOps.sampleExactPerClass(spark.read.parquet(in),
          col(opts.getOrElse("class", "event_type")),
          col(opts.getOrElse("key", "event_id")),
          opts.getOrElse("k", "100").toInt)
          .write.mode("overwrite").parquet(out)
      case "hourly-counts" =>
        val tweets = TweetOps.parseTsv(text)
        val filter = if (opts.get("egypt").contains("true"))
          Some(TweetOps.egyptPattern) else None
        // pre-rendered single-column lines: the text sink writes them raw
        // (the csv writer would quote the embedded tabs)
        TweetOps.render(TweetOps.hourlyCounts(tweets, filter))
          .write.mode("overwrite").text(out)
      case other =>
        throw new IllegalArgumentException(s"unknown tool '$other'\n$usage")
    }
  }
}
