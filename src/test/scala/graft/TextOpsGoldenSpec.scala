package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Golden-output tests on the reference's own corpus
  * (reference/assignment2/bible+shakes.nopunc.gz, 156,215 lines):
  * WordCount spot answers (reference/assignment1/assignment1.md:4-9) and
  * the PMI targets (reference/assignment2/assignment2.md:17-27).
  */
class TextOpsGoldenSpec extends SparkSpec {

  private val gzPath = "/root/reference/assignment2/bible+shakes.nopunc.gz"
  private def haveCorpus = new java.io.File(gzPath).exists()
  private lazy val corpus = spark.read.text(gzPath)
    .withColumn("doc_id", monotonically_increasing_id())

  test("wordcount reproduces assignment-1 spot answers") {
    assume(haveCorpus)
    val wc = TextOps.wordCount(corpus, "value")
    wc.persist()
    val m = wc.where(col("word").isin("aaron", "zorah", "''but"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("aaron" -> 416L, "zorah" -> 8L, "''but" -> 1L))
    assert(wc.count() === 41788L, "distinct vocabulary")
    wc.unpersist()
    assert(corpus.count() === 156215L, "corpus lines")
  }

  test("PMI reproduces assignment-2 goldens (count, max, cloud/love top-3)") {
    assume(haveCorpus)
    val pmi = TextOps.pmi(corpus, "doc_id", "value", minCount = 10)
    pmi.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // True count of pairs with doc-count >= 10 (confirmed independently
    // with DuckDB on the same corpus): 116,759.
    assert(pmi.count() === 116759L)

    // The reference reports 107,511 (assignment2.md:17) — an artifact of a
    // parsing bug, not different PMI semantics: job 2 re-parses job 1's
    // TEXT output with split("-") (PairsPMI.java:231-233), and Java prints
    // floats < 1e-3 in scientific notation ("7.75E-4"), whose '-' makes the
    // split produce 3 fields and the pair silently dropped. Emulating that
    // drop (P(x,y)/P(x) >= 1e-3 in float32) reproduces 107,511 exactly.
    val terms = TextOps.docDistinctTerms(corpus, "doc_id", "value")
    val marg = terms.select(explode(col("terms")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("df"))
    val refCompat = TextOps.pairDocCounts(corpus, "doc_id", "value")
      .where(col("n_docs") >= 10)
      .join(marg.withColumnRenamed("t", "x").withColumnRenamed("df", "df_x"), "x")
      .where((col("n_docs").cast("float") / lit(156215.0f)) /
        (col("df_x").cast("float") / lit(156215.0f)) >= 0.001)
    assert(refCompat.count() === 107511L)

    // :20 — max PMI 9.319931, the abednego/meshach/shadrach 3-way tie
    val top = pmi.orderBy(col("pmi").desc).limit(3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
    assert(top.map(t => Set(t._1, t._2)).toSet ===
      Set(Set("abednego", "meshach"), Set("abednego", "shadrach"),
        Set("meshach", "shadrach")))
    top.foreach(t => assert(math.abs(t._3 - 9.319931) < 1e-4))

    // :25/:27 — top-3 partners of "cloud" and "love" (reference float32)
    def top3(w: String): Seq[(String, Double)] =
      pmi.where(col("x") === w || col("y") === w)
        .select(when(col("x") === w, col("y")).otherwise(col("x")).as("partner"),
          col("pmi"))
        .orderBy(col("pmi").desc).limit(3)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val cloud = top3("cloud")
    assert(cloud.map(_._1) === Seq("tabernacle", "glory", "fire"))
    Seq(4.153025, 3.3988752, 3.2354724).zip(cloud.map(_._2))
      .foreach { case (e, g) => assert(math.abs(e - g) < 1e-4) }
    val love = top3("love")
    assert(love.map(_._1) === Seq("hate", "hermia", "commandments"))
    Seq(2.5755355, 2.0289917, 1.9395468).zip(love.map(_._2))
      .foreach { case (e, g) => assert(math.abs(e - g) < 1e-4) }
    pmi.unpersist()
  }
}
