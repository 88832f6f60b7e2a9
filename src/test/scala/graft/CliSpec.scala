package graft

import graft.cli.Main
import java.nio.file.Files

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

  test("unknown tool raises a usage error") {
    intercept[IllegalArgumentException] {
      Main.run(spark, "no-such-tool", Map.empty)
    }
  }
}
