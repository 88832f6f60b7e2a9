package graft

import graft.cli.Main
import java.nio.file.Files
import org.apache.spark.sql.functions.max

/** Drives every CLI subcommand end-to-end on tiny inputs. */
class CliSpec extends SparkSpec {

  private lazy val corpusFile = {
    val f = Files.createTempFile("graft-cli-corpus", ".txt")
    Files.writeString(f,
      """the quick brown fox
        |the lazy dog sleeps
        |quick quick fox runs
        |""".stripMargin)
    f.toString
  }

  private lazy val graphFile = {
    val f = Files.createTempFile("graft-cli-graph", ".txt")
    Files.writeString(f, "1\t2\t3\n2\t3\n3\t1\n4\t1\n")
    f.toString
  }

  private lazy val tweetsFile = {
    val f = Files.createTempFile("graft-cli-tweets", ".txt")
    Files.writeString(f,
      "1\tSun Jan 23 10:14:32 +0000 2011\ta\tegypt news\n" +
        "2\tSun Jan 23 10:20:00 +0000 2011\tb\tother\n")
    f.toString
  }

  private def tmpOut(): String =
    Files.createTempDirectory("graft-cli-out").toString + "/out"

  private def readTsv(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    d.listFiles().filter(f => f.getName.endsWith(".csv") || f.getName.endsWith(".txt"))
      .toSeq.flatMap(f => scala.io.Source.fromFile(f).getLines())
  }

  test("table-maintenance subcommands: compact, compact-manifest, vacuum-manifest") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-cli-maint").toString
    // plain-table compaction
    spark.range(5000).toDF("id").repartition(10).write.parquet(s"$base/plain")
    Main.run(spark, "compact", Map("input" -> s"$base/plain"))
    assert(spark.read.parquet(s"$base/plain").count() === 5000)
    assert(new java.io.File(s"$base/plain").listFiles()
      .count(_.getName.endsWith(".parquet")) < 10)
    // manifested-table compaction + vacuum, with stats/clustering flags
    graft.operators.LayoutOps.writeManifested(
      spark.range(3000).toDF("id"), s"$base/mt", numFiles = 8)
    Main.run(spark, "compact-manifest", Map("input" -> s"$base/mt",
      "stats-cols" -> "id", "cluster-by" -> "id"))
    Main.run(spark, "vacuum-manifest", Map("input" -> s"$base/mt"))
    assert(graft.operators.LayoutOps.readManifested(spark, s"$base/mt")
      .count() === 3000)
    Main.run(spark, "show-manifest", Map("input" -> s"$base/mt"))
    Main.run(spark, "count-manifest", Map("input" -> s"$base/mt",
      "col" -> "id", "lower" -> "100", "upper" -> "199"))
    Main.run(spark, "delete-manifest", Map("input" -> s"$base/mt",
      "col" -> "id", "lower" -> "0", "upper" -> "999"))
    assert(graft.operators.LayoutOps.readManifested(spark, s"$base/mt")
      .count() === 2000, "CLI range delete removed ids 0-999")
    val desc = graft.operators.LayoutOps.describeManifest(spark, s"$base/mt")
    assert(desc.head.startsWith("generation: 2"), desc.head)
    assert(desc.exists(_.startsWith("schema: id BIGINT")), desc)
    assert(desc.count(_.contains("\"id\":{\"t\":\"l\"")) >= 1,
      s"per-file stats listed: $desc")
    // bounds on a STRING stats column: the value is typed from the
    // manifest's recorded tag (used to crash in _.toLong); --bound-type
    // overrides; a value failing its declared type is a friendly error
    graft.operators.LayoutOps.writeManifested(
      Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)).toDF("k", "id"),
      s"$base/st", numFiles = 2, statsCols = Seq("k", "id"),
      clusterBy = Seq("k"))
    Main.run(spark, "delete-manifest", Map("input" -> s"$base/st",
      "col" -> "k", "lower" -> "b", "upper" -> "c"))
    assert(graft.operators.LayoutOps.readManifested(spark, s"$base/st")
      .collect().map(_.getString(0)).sorted.toSeq === Seq("a", "d"),
      "string-typed CLI bounds delete the right rows")
    Main.run(spark, "count-manifest", Map("input" -> s"$base/st",
      "col" -> "id", "lower" -> "1", "upper" -> "9",
      "bound-type" -> "long"))
    val err = intercept[IllegalArgumentException] {
      Main.run(spark, "count-manifest", Map("input" -> s"$base/st",
        "col" -> "id", "lower" -> "not-a-number"))
    }
    assert(err.getMessage.contains("not a valid long"), err.getMessage)
    // rollback: happy path via --to-generation, then the missing-target
    // usage error (a raw NoSuchElementException is not a CLI answer)
    Main.run(spark, "rollback-manifest", Map("input" -> s"$base/st",
      "to-generation" -> "0"))
    assert(graft.operators.LayoutOps.readManifested(spark, s"$base/st")
      .count() === 4, "rollback restored the pre-delete generation")
    val rbErr = intercept[IllegalArgumentException] {
      Main.run(spark, "rollback-manifest", Map("input" -> s"$base/st"))
    }
    assert(rbErr.getMessage.contains("--to-generation N | --as-of"),
      rbErr.getMessage)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("wordcount / bigrams / cooc / pmi subcommands produce TSV output") {
    for (tool <- Seq("wordcount", "bigrams", "cooc-pairs", "cooc-stripes")) {
      val out = tmpOut()
      Main.run(spark, tool, Map("input" -> corpusFile, "output" -> out))
      assert(readTsv(out).nonEmpty, tool)
    }
    val wcOut = tmpOut()
    Main.run(spark, "wordcount", Map("input" -> corpusFile, "output" -> wcOut))
    val wc = readTsv(wcOut).map(_.split("\t")).map(a => a(0) -> a(1).toLong).toMap
    assert(wc("quick") === 3L && wc("the") === 2L)
    // pmi on a tiny corpus with min-count 1
    val pmiOut = tmpOut()
    Main.run(spark, "pmi", Map("input" -> corpusFile, "output" -> pmiOut,
      "min-count" -> "1"))
    assert(readTsv(pmiOut).nonEmpty)
  }

  test("build-index then lookup-postings round-trips through parquet") {
    val idx = tmpOut()
    Main.run(spark, "build-index", Map("input" -> corpusFile, "output" -> idx))
    // decodable and queryable
    Main.run(spark, "lookup-postings", Map("input" -> idx, "term" -> "quick",
      "output" -> "unused"))
    Main.run(spark, "lookup-postings", Map("input" -> idx, "term" -> "absent",
      "output" -> "unused"))
  }

  test("lookup-postings --mapfile reproduces the reference goldens via MapFile.Reader") {
    val gzPath = "/root/reference/assignment2/bible+shakes.nopunc.gz"
    assume(new java.io.File(gzPath).exists(), "reference dataset not present")
    // same decompressed corpus the IndexOpsSpec goldens use (docids are
    // byte offsets of the uncompressed file)
    val plain = new java.io.File("/tmp/graft-bibleshakes.txt")
    if (!plain.exists()) {
      val in = new java.util.zip.GZIPInputStream(new java.io.FileInputStream(gzPath))
      java.nio.file.Files.copy(in, plain.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      in.close()
    }
    val idx = tmpOut()
    val mf = tmpOut()
    Main.run(spark, "build-index", Map("input" -> plain.getPath, "output" -> idx,
      "mapfile" -> mf, "num-parts" -> "2"))
    def captured(term: String): String = {
      val bos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
        Main.run(spark, "lookup-postings", Map("input" -> "unused",
          "output" -> "unused", "term" -> term, "mapfile" -> mf))
      }
      bos.toString("UTF-8").trim
    }
    // exact line-for-line parity with the reference's committed tool output
    val goldenLines = scala.io.Source
      .fromFile("/root/reference/assignment3/LookupPostingsCompressed.out")
      .getLines().toSeq
    def goldenLine(prefix: String): String =
      goldenLines.find(_.startsWith(prefix)).getOrElse(fail(s"golden missing $prefix"))
    assert(captured("gold") === goldenLine("Complete postings list for 'gold'"))
    assert(captured("silver") === goldenLine("Complete postings list for 'silver'"))
    assert(captured("bronze") === goldenLine("the term bronze does not appear"))
  }

  test("boolean-retrieval prints matching lines") {
    Main.run(spark, "boolean-retrieval", Map("collection" -> corpusFile,
      "query" -> "quick fox AND", "input" -> "unused", "output" -> "unused"))
  }

  test("pagerank and personalized-pagerank write rank tables") {
    val out1 = tmpOut()
    Main.run(spark, "pagerank", Map("input" -> graphFile, "output" -> out1,
      "iterations" -> "5", "top" -> "4", "partitions" -> "2"))
    val rows = readTsv(out1)
    assert(rows.size === 4)
    val out2 = tmpOut()
    Main.run(spark, "personalized-pagerank", Map("input" -> graphFile,
      "output" -> out2, "sources" -> "1,4", "iterations" -> "5",
      "top" -> "3", "partitions" -> "2"))
    assert(readTsv(out2).size === 6)
  }

  test("hourly-counts renders golden shape with and without egypt filter") {
    val out = tmpOut()
    Main.run(spark, "hourly-counts", Map("input" -> tweetsFile, "output" -> out))
    assert(readTsv(out) === Seq("1/23\t10\t2"))
    val out2 = tmpOut()
    Main.run(spark, "hourly-counts", Map("input" -> tweetsFile,
      "output" -> out2, "egypt" -> "true"))
    assert(readTsv(out2) === Seq("1/23\t10\t1"))
  }

  test("pipeline subcommands: dedup-clusters, sample-exact, bloom contamination") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different content about spark engines")
    ).toDF("doc_id", "text")
    val docsPath = tmpOut()
    docs.write.parquet(docsPath)

    val clustersOut = tmpOut()
    Main.run(spark, "dedup-clusters", Map("input" -> docsPath,
      "output" -> clustersOut, "threshold" -> "0.5"))
    val clusters = spark.read.parquet(clustersOut).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters === Map(1L -> 1L, 2L -> 1L))

    val bloomOut = tmpOut()
    Main.run(spark, "contamination", Map("input" -> docsPath,
      "benchmark" -> docsPath, "output" -> bloomOut, "bloom-bits" -> "65536"))
    // benchmark == corpus -> every shingle hits its own bloom entry
    val rates = spark.read.parquet(bloomOut).collect().map(_.getDouble(3))
    assert(rates.forall(_ === 1.0))

    val evPath = tmpOut()
    spark.range(100).selectExpr("CAST(id % 3 AS STRING) AS event_type", "id AS event_id")
      .write.parquet(evPath)
    val sampleOut = tmpOut()
    Main.run(spark, "sample-exact", Map("input" -> evPath,
      "output" -> sampleOut, "class" -> "event_type", "key" -> "event_id", "k" -> "5"))
    val counts = spark.read.parquet(sampleOut).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.toSeq === Seq(5L, 5L, 5L))
  }

  test("ann-topk serves all four methods; pq/ivf/lsh rows are a subset " +
      "shape of brute's (query_id, vec_id, score, rn)") {
    val emb = "/root/testdata/sf0.001/embeddings.parquet"
    for (method <- Seq("brute", "lsh", "ivf", "pq")) {
      val out = tmpOut()
      Main.run(spark, "ann-topk", Map("input" -> emb, "output" -> out,
        "method" -> method, "k" -> "5"))
      val got = spark.read.parquet(out)
      assert(got.count() > 0, method)
      assert(got.columns.length === 4, method)
      assert(got.select(max("rn")).head().getInt(0) <= 5, method)
    }
    intercept[IllegalArgumentException] {
      Main.run(spark, "ann-topk", Map("input" -> emb,
        "output" -> tmpOut(), "method" -> "hnsw"))
    }
  }

  test("ann-build persists a model that ann-topk --model probes without retraining") {
    val emb = "/root/testdata/sf0.001/embeddings.parquet"
    val base = Files.createTempDirectory("graft-cli-annb").toString
    for (method <- Seq("ivf", "pq")) {
      Main.run(spark, "ann-build", Map("input" -> emb,
        "output" -> s"$base/$method-model", "method" -> method,
        "nlist" -> "8", "cells" -> "4"))
      Main.run(spark, "ann-topk", Map("input" -> emb,
        "output" -> s"$base/$method-stored", "method" -> method,
        "nlist" -> "8", "cells" -> "4", "model" -> s"$base/$method-model"))
      Main.run(spark, "ann-topk", Map("input" -> emb,
        "output" -> s"$base/$method-fresh", "method" -> method,
        "nlist" -> "8", "cells" -> "4"))
      val stored = spark.read.parquet(s"$base/$method-stored")
        .collect().map(_.toSeq).toSet
      val fresh = spark.read.parquet(s"$base/$method-fresh")
        .collect().map(_.toSeq).toSet
      // ivf's CLI default trains without per-iteration quantization, so
      // compare the stored-model probe against the fresh one only in
      // shape there; pq quantizes deterministically -> exact equality
      assert(stored.nonEmpty, method)
      if (method == "pq") assert(stored === fresh, method)
    }
    // ivfpq persists BOTH quantizers (<model>/ivf + <model>/pq), and both
    // train with the rounded deterministic recipe -> stored == fresh
    Main.run(spark, "ann-build", Map("input" -> emb,
      "output" -> s"$base/ivfpq-model", "method" -> "ivfpq",
      "nlist" -> "8", "cells" -> "4"))
    Main.run(spark, "ann-topk", Map("input" -> emb,
      "output" -> s"$base/ivfpq-stored", "method" -> "ivfpq",
      "nlist" -> "8", "cells" -> "4", "model" -> s"$base/ivfpq-model"))
    Main.run(spark, "ann-topk", Map("input" -> emb,
      "output" -> s"$base/ivfpq-fresh", "method" -> "ivfpq",
      "nlist" -> "8", "cells" -> "4"))
    val stored = spark.read.parquet(s"$base/ivfpq-stored")
      .collect().map(_.toSeq).toSet
    val fresh = spark.read.parquet(s"$base/ivfpq-fresh")
      .collect().map(_.toSeq).toSet
    assert(stored === fresh)
    assert(stored.nonEmpty)
  }

  test("dedup-index + dedup-incremental classify a batch from a stored index") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-cli-dinc").toString
    Seq((0L, "the quick brown fox jumps over the lazy dog"),
        (2L, "completely different content about spark engines"))
      .toDF("doc_id", "text").write.parquet(s"$base/corpus")
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (3L, "entirely novel text on manifest committed tables"))
      .toDF("doc_id", "text").write.parquet(s"$base/batch")
    Main.run(spark, "dedup-index",
      Map("input" -> s"$base/corpus", "output" -> s"$base/idx"))
    Main.run(spark, "dedup-incremental", Map("input" -> s"$base/batch",
      "output" -> s"$base/out", "index" -> s"$base/idx"))
    val got = spark.read.parquet(s"$base/out")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "exact", 3L -> "new"))
    // --corpus path (index computed on the fly) agrees
    Main.run(spark, "dedup-incremental", Map("input" -> s"$base/batch",
      "output" -> s"$base/out2", "corpus" -> s"$base/corpus"))
    val got2 = spark.read.parquet(s"$base/out2")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got2 === got)
    intercept[IllegalArgumentException] {
      Main.run(spark, "dedup-incremental",
        Map("input" -> s"$base/batch", "output" -> s"$base/out3"))
    }
  }

  test("curate composes dedup, quality, decontamination and resample with an audit report") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-cli-curate").toString
    // 8 docs: 1 byte-dup of 0, 2 near-dup of 0 (token-level), 3 too short,
    // 4 contaminated by the benchmark, 5-7 clean keepers across two sources
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog today", "web"),
      (1L, "the quick brown fox jumps over the lazy dog today", "web"),
      (2L, "the quick brown fox jumps over the lazy dog tomorrow", "web"),
      (3L, "too short", "web"),
      (4L, "benchmark question about spark shuffles and joins exactly", "web"),
      (5L, "completely original content about graph partitioning at scale", "books"),
      (6L, "another unique document describing manifest committed tables", "books"),
      (7L, "fresh words on sequence packing and mixture resampling", "web")
    ).toDF("doc_id", "text", "source").write.parquet(s"$base/docs")
    Seq((100L, "benchmark question about spark shuffles and joins exactly"))
      .toDF("doc_id", "text").write.parquet(s"$base/bench")
    Main.run(spark, "curate", Map(
      "input" -> s"$base/docs", "output" -> s"$base/out",
      "threshold" -> "0.3", "min-tokens" -> "5",
      "benchmark" -> s"$base/bench", "max-contamination" -> "0.5"))
    val kept = spark.read.parquet(s"$base/out/docs")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 5L, 6L, 7L),
      "dup, near-dup, short and contaminated docs are gone; originals stay")
    val report = readTsv(s"$base/out/report").map(_.split("\t"))
      .map(a => a(0) -> a(1).toLong).toMap
    assert(report("input") === 8)
    assert(report("exact_dedup") === 7, "doc 1 dropped")
    assert(report("near_dedup") === 6, "doc 2 dropped")
    assert(report("quality") === 5, "doc 3 dropped")
    assert(report("decontaminate") === 4, "doc 4 dropped")
    // resample stage: quotas are exact and deterministic
    Main.run(spark, "curate", Map(
      "input" -> s"$base/docs", "output" -> s"$base/out2",
      "threshold" -> "0.3", "min-tokens" -> "5",
      "resample" -> "web=0.5,books=0.5", "group-col" -> "source"))
    val out2 = spark.read.parquet(s"$base/out2/docs")
    // after dedup+quality 5 docs remain (3 web, 2 books); 50/50 quota ->
    // M = min(3/.5, 2/.5) = 4 -> 2 web + 2 books
    assert(out2.count() === 4)
    assert(out2.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("web" -> 2L, "books" -> 2L))

    // malformed --resample follows the CLI's usage-error convention, not
    // an opaque MatchError
    for (bad <- Seq("web", "web=", "=0.5", "web=abc")) {
      val e = intercept[IllegalArgumentException] {
        Main.run(spark, "curate", Map(
          "input" -> s"$base/docs", "output" -> s"$base/out3",
          "resample" -> bad))
      }
      assert(e.getMessage.contains("--resample"), s"input '$bad': $e")
    }
  }

  test("curate --quality-model applies a stored learned filter as a stage") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-cli-qmodel").toString
    // seed set: separable good/spam vocabulary
    (0 until 40).map { i =>
      if (i % 2 == 0)
        (i.toLong, "good clean prose with varied useful words number " + i, 1L)
      else (i.toLong, "spam spam buy buy click click now now offer " + i, 0L)
    }.toDF("doc_id", "text", "y").write.parquet(s"$base/seed")
    Main.run(spark, "quality-train", Map("input" -> s"$base/seed",
      "output" -> s"$base/model", "label" -> "y = 1",
      "dims" -> "32", "iterations" -> "30", "lr" -> "5.0"))
    // corpus: two good docs, one spam doc (all unique — dedup stages pass)
    Seq((100L, "good clean prose with varied useful words number alpha"),
        (101L, "good clean prose with varied useful words number beta"),
        (102L, "spam spam buy buy click click now now offer gamma"))
      .toDF("doc_id", "text").write.parquet(s"$base/docs")
    Main.run(spark, "curate", Map("input" -> s"$base/docs",
      "output" -> s"$base/out", "threshold" -> "0.9",
      "quality-model" -> s"$base/model", "min-prob" -> "0.5"))
    val kept = spark.read.parquet(s"$base/out/docs")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(100L, 101L), "the learned filter drops the spam doc")
    val report = readTsv(s"$base/out/report").map(_.split("\t"))
      .map(a => a(0) -> a(1).toLong).toMap
    assert(report("quality_model") === 2)
  }

  test("vocab-induce + subword-count round-trip through parquet") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-cli-vocab").toString
    Seq((1L, "alpha alpha beta"), (2L, "alpha gamma")).toDF("doc_id", "text")
      .write.parquet(s"$base/docs")
    Main.run(spark, "vocab-induce", Map("input" -> s"$base/docs",
      "output" -> s"$base/vocab", "top-k" -> "20"))
    val vocab = spark.read.parquet(s"$base/vocab")
    assert(vocab.columns.toSeq === Seq("piece", "cnt", "rank"))
    assert(vocab.count() === 20)
    Main.run(spark, "subword-count", Map("input" -> s"$base/docs",
      "output" -> s"$base/counts", "vocab" -> s"$base/vocab"))
    val counts = spark.read.parquet(s"$base/counts")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set(1L, 2L))
    assert(counts.values.forall(_ >= 3L),
      "every word splits into at least one piece")
  }

  test("corpus-card prints the datasheet JSON and writes the mixture table") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-cli-card").toString
    Seq((1L, "one two three", "web", "en"),
        (2L, "one two three", "web", "en"),   // exact dup
        (3L, "quatre cinq", "books", "fr"))
      .toDF("doc_id", "text", "source", "lang").write.parquet(s"$base/docs")
    val outStream = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(outStream)) {
      Main.run(spark, "corpus-card",
        Map("input" -> s"$base/docs", "output" -> s"$base/card"))
    }
    val json = outStream.toString.linesIterator
      .find(_.startsWith("{")).getOrElse("")
    assert(json.contains("\"docs\":3"))
    assert(json.contains("\"tokens\":8"))
    assert(json.contains("\"exact_dup_rate\":0.333333"))
    val mix = spark.read.parquet(s"$base/card/mixture")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(mix === Map(("web", "en") -> 2L, ("books", "fr") -> 1L))
  }

  test("media-features decodes real PNGs into ANN-ready feature parquet") {
    import spark.implicits._
    import graft.operators.MultimodalOps
    val base = Files.createTempDirectory("graft-cli-media").toString
    Seq(
      (1L, MultimodalOps.grayPng(Array.fill(64)(128), 8, 8)),
      (2L, MultimodalOps.grayPng(Array.fill(64)(0), 8, 8)),
      (3L, Array[Byte](1, 2, 3)) // corrupt -> dropped
    ).toDF("asset_id", "content").write.parquet(s"$base/imgs")
    Main.run(spark, "media-features", Map("input" -> s"$base/imgs",
      "output" -> s"$base/feats", "kind" -> "image"))
    val feats = spark.read.parquet(s"$base/feats")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats.keySet === Set(1L, 2L), "corrupt asset dropped")
    assert(feats(1L).forall(v => math.abs(v - 128 / 255.0f) < 1e-6))
    assert(feats(2L).forall(_ === 0.0f))
  }

  test("video-frames walks an AVI into per-frame rows with sentinels " +
      "for corrupt containers") {
    import spark.implicits._
    import graft.operators.MultimodalOps
    val base = Files.createTempDirectory("graft-cli-vf").toString
    val px = Array.tabulate(16)(i => i * 16)
    val avi = MultimodalOps.framesAvi(Seq(
      MultimodalOps.grayPngBytes(px, 4, 4),
      MultimodalOps.grayPngBytes(px.map(255 - _), 4, 4)),
      width = 4, height = 4, fps = 10, fourcc = "MPNG")
    Seq((1L, avi), (2L, Array[Byte](5, 5, 5)))
      .toDF("asset_id", "content").write.parquet(s"$base/vids")
    Main.run(spark, "video-frames", Map("input" -> s"$base/vids",
      "output" -> s"$base/frames"))
    val rows = spark.read.parquet(s"$base/frames")
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getDouble(4))).toMap
    assert(rows.keySet === Set((1L, 0), (1L, 1), (2L, -1)))
    assert(rows((1L, 0)) === ((4, px.sum / 16.0)))
    assert(rows((1L, 1))._2 === px.map(255 - _).sum / 16.0)
    assert(rows((2L, -1))._1 === -1, "corrupt container keeps a sentinel")
  }

  test("unknown tool raises a usage error") {
    intercept[IllegalArgumentException] {
      Main.run(spark, "no-such-tool", Map.empty)
    }
  }
}
