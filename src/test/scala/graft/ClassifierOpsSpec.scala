package graft

import graft.operators.ClassifierOps
import org.apache.spark.sql.functions._

/** Learned quality filter: logistic regression over hashing-trick
  * bag-of-words (full-batch GD, driver-held weights).
  */
class ClassifierOpsSpec extends SparkSpec {
  import spark.implicits._

  test("LR separates a planted vocabulary split perfectly") {
    // positive docs speak one vocabulary, negative docs another —
    // linearly separable in hashed-BoW space (unless both vocabularies
    // collide into identical bucket patterns, which 32 buckets makes
    // vanishingly unlikely for disjoint token sets)
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0)
        (i.toLong, "good clean prose with varied useful words number " + i, 1.0)
      else
        (i.toLong, "spam spam buy buy click click now now offer " + i, 0.0)
    }.toDF("doc_id", "text", "y")
    val out = ClassifierOps.qualityClassifier(docs, "doc_id", "text",
      col("y") === 1.0, dims = 32, iterations = 30, lr = 5.0)
      .collect().map(r => (r.getDouble(1), r.getBoolean(3)))
    assert(out.length === 40)
    val correct = out.count { case (label, pred) => (label >= 0.5) == pred }
    assert(correct === 40, s"separable data must classify perfectly, got $correct/40")
  }

  test("training is deterministic under input repartitioning") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val w1 = ClassifierOps.trainLogReg(docs, "doc_id", "text",
      col("lang") === "en", dims = 16, iterations = 3)
    val w2 = ClassifierOps.trainLogReg(docs.repartition(7), "doc_id", "text",
      col("lang") === "en", dims = 16, iterations = 3)
    assert(w1.toSeq === w2.toSeq,
      "per-iteration rounding must absorb partitioning noise")
  }

  test("training lowers the log-loss below the zero-model's ln 2") {
    // the driver fixture's text shares one vocabulary across languages, so
    // the label is (by construction) barely learnable — but full-batch GD
    // on a convex loss must still beat the untrained w=0 model (log-loss
    // ln 2 ≈ 0.6931): at minimum the bias learns the base rate
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = ClassifierOps.qualityClassifier(docs, "doc_id", "text",
      col("lang") === "en", dims = 64, iterations = 20, lr = 2.0)
    val loss = out.select(avg(
      -(col("label") * log(col("prob")) +
        (lit(1.0) - col("label")) * log(lit(1.0) - col("prob")))))
      .head().getDouble(0)
    assert(loss < math.log(2.0) - 1e-3,
      f"trained log-loss $loss%.4f must undercut the zero model's ln 2")
  }

  test("quality-train / quality-score CLI round-trips a stored model") {
    val base = java.nio.file.Files.createTempDirectory("graft-qc").toString
    val docsPath = "/root/testdata/sf0.001/documents.parquet"
    graft.cli.Main.run(spark, "quality-train", Map(
      "input" -> docsPath, "output" -> s"$base/model",
      "label" -> "lang = 'en'", "dims" -> "16", "iterations" -> "3"))
    graft.cli.Main.run(spark, "quality-score", Map(
      "input" -> docsPath, "output" -> s"$base/scored",
      "model" -> s"$base/model"))
    val viaCli = spark.table("parquet.`" + s"$base/scored" + "`")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the stored model must score identically to an in-process train+score
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val w = ClassifierOps.trainLogReg(docs, "doc_id", "text",
      col("lang") === "en", dims = 16, iterations = 3)
    val direct = ClassifierOps.scoreLogReg(docs, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaCli === direct)
    assert(viaCli.nonEmpty)
  }

  test("null labels are dropped from training, not counted or propagated") {
    // a label expression like `lang = 'en'` is NULL on null lang — such
    // docs must neither inflate n nor poison a gradient bucket to NULL
    val base = Seq(
      (1L, "good clean text about spark", "en"),
      (2L, "aaa bbb ccc ddd", "fr"),
      (3L, "more good text about engines", "en"),
      (4L, "xxx yyy zzz", "fr")).toDF("doc_id", "text", "lang")
    val withNulls = base.union(Seq(
      (5L, "unlabeled doc with its own rare vocabulary qqqq wwww", null: String),
      (6L, "another unlabeled zzzzz doc", null: String))
      .toDF("doc_id", "text", "lang"))
    val wClean = ClassifierOps.trainLogReg(base, "doc_id", "text",
      col("lang") === "en", dims = 16, iterations = 3)
    val wNulls = ClassifierOps.trainLogReg(withNulls, "doc_id", "text",
      col("lang") === "en", dims = 16, iterations = 3)
    assert(wNulls.toSeq === wClean.toSeq,
      "null-labeled docs must be invisible to training")
  }

  test("empty corpus trains a zero model and scores nothing") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val w = ClassifierOps.trainLogReg(empty, "doc_id", "text",
      lit(true), dims = 8, iterations = 2)
    assert(w.toSeq === Seq.fill(9)(0.0))
    assert(ClassifierOps.scoreLogReg(empty, "doc_id", "text", w).count() === 0)
  }
}
