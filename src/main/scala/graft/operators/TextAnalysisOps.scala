package graft.operators

import graft.functions.{GraftFunctions, StopwordHits}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, and winnowing document fingerprints.
  * Everything is pure column expressions (whole-stage codegen, no UDFs);
  * each operator is a per-row map, so the only shuffles are whatever the
  * caller aggregates afterwards.
  */
object TextAnalysisOps {

  /** Tiny embedded stopword profiles. Deliberately small and deterministic:
    * language ID here is a scoring *operator* (the capability), not a model —
    * swap in bigger profiles for production use.
    */
  val stopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "von", "ist", "mit", "den", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "que", "pour", "dans"))

  /** All four profiles' hit counts in ONE token pass (native kernel
    * graft.functions.StopwordHits) — replaces one interpreted `filter` HOF
    * per language. Output order = [[StopwordHits.langs]]. */
  def stopwordHitCounts(toks: Column): Column = {
    GraftFunctions.registerActive()
    call_function("graft_stop_hits", toks)
  }

  /** Per-language stopword hit ratio: hits(lang) / n_tokens. */
  def stopwordRatio(toks: Column, lang: String): Column = {
    val idx = StopwordHits.langs.indexOf(lang)
    require(idx >= 0, s"no stopword profile for '$lang'")
    element_at(stopwordHitCounts(toks), idx + 1).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** n-gram-heuristic language ID: argmax stopword ratio, "und" when no
    * profile scores above `minRatio`. Deterministic tiebreak: profile order
    * en > es > de > fr (strict > comparison keeps the earlier winner).
    * One native kernel call (graft.functions.LangId) — the equivalent CASE
    * tree re-inlines the hit counts into every branch and overflows codegen
    * limits into interpreted, no-CSE projection. [[langIdColumns]] keeps
    * that column formulation as the cross-checked reference. */
  def langId(toks: Column, minRatio: Double = 0.02): Column = {
    GraftFunctions.registerActive()
    call_function("graft_langid", toks, lit(minRatio))
  }

  /** Column-fold language ID — reference implementation for [[langId]]. */
  def langIdColumns(toks: Column, minRatio: Double = 0.02): Column = {
    val langs = StopwordHits.langs
    val hits = stopwordHitCounts(toks)
    val n = greatest(size(toks), lit(1)).cast("double")
    val scored = langs.zipWithIndex.map { case (l, i) =>
      (l, element_at(hits, i + 1).cast("double") / n)
    }
    val best = scored.tail.foldLeft(struct(lit(scored.head._1).as("lang"),
      scored.head._2.as("score"))) { case (acc, (l, s)) =>
      when(s > acc.getField("score"), struct(lit(l).as("lang"), s.as("score")))
        .otherwise(acc)
    }
    when(best.getField("score") >= minRatio, best.getField("lang")).otherwise(lit("und"))
  }

  /** Heuristic quality components + composite score in [0, 1]:
    * mean token length band, English-stopword presence, repetition penalty,
    * alphabetic-character ratio. Deterministic; weights sum to 1. */
  def qualityColumns(text: Column): Seq[Column] = {
    val toks = TextOps.tokens(text)
    val nToks = size(toks)
    val meanLen = when(nToks > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nToks)
      .otherwise(lit(0.0))
    val stopRatio = stopwordRatio(toks, "en")
    val distinctRatio = when(nToks > 0,
      size(array_distinct(toks)).cast("double") / nToks).otherwise(lit(0.0))
    val alphaRatio = when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[a-zA-Z]", ""))).cast("double") /
        length(text)).otherwise(lit(0.0))
    val lenScore = when(meanLen >= 3 && meanLen <= 10, lit(1.0))
      .otherwise(when(meanLen > 0, lit(0.5)).otherwise(lit(0.0)))
    val score = lenScore * 0.25 + least(stopRatio * lit(5.0), lit(1.0)) * 0.25 +
      distinctRatio * 0.25 + alphaRatio * 0.25
    Seq(nToks.as("n_tokens"), round(meanLen, 6).as("mean_token_len"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(distinctRatio, 6).as("distinct_ratio"),
      round(alphaRatio, 6).as("alpha_ratio"), round(score, 6).as("quality"))
  }

  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol) +: qualityColumns(col(textCol)): _*)

  /** Token counts three ways: whitespace tokens, BPE-ish regex tokens
    * (word runs + single non-space punctuation — the classic pre-tokenizer
    * shape), and a chars/4 approximation of subword count. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // regexp_count, not size(regexp_extract_all(...)) / size(tokens(...)):
    // counting must not materialize an array of every match — at 5M docs
    // that allocation (one String per token per doc) dominated the query
    // and made it the worst decade-2 scaler on the board (5.0x). \S+ runs
    // count exactly the non-empty whitespace-split tokens.
    docs.select(col(idCol),
      regexp_count(col(textCol), lit("\\S+")).as("ws_tokens"),
      regexp_count(col(textCol), lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"))
        .as("regex_tokens"),
      ceil(length(col(textCol)).cast("double") / 4).cast("long").as("approx_subwords"))

  /** Built-in PII/redaction patterns (name -> regex), applied in order.
    * Each regex is chosen to parse identically under Java's regex engine
    * (Spark, codegen'd) and RE2 (the DuckDB verification oracle): plain
    * character classes, non-capturing groups, counted repetition, `\b`
    * and `\d` only — no backreferences or lookaround. URL runs first so
    * an address embedded in a URL collapses to one placeholder. */
  val redactionPatterns: Seq[(String, String)] = Seq(
    "url"   -> "https?://[^\\s]+",
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4"  -> "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b",
    "ssn"   -> "\\b\\d{3}-\\d{2}-\\d{4}\\b")

  /** Replace every match of each pattern with a `<NAME>` placeholder — a
    * chain of codegen'd regexp_replace, one streaming pass per pattern,
    * no UDF, no shuffle. */
  def redactText(text: Column,
                 patterns: Seq[(String, String)] = redactionPatterns): Column =
    patterns.foldLeft(text) { case (c, (name, re)) =>
      regexp_replace(c, re, s"<${name.toUpperCase}>")
    }

  /** Per-doc redaction plus per-pattern match counts. Counts are taken on
    * the ORIGINAL text (an email inside a URL counts under both), so they
    * measure exposure before scrubbing — the number a pipeline reports. */
  def redact(docs: DataFrame, idCol: String, textCol: String,
             patterns: Seq[(String, String)] = redactionPatterns): DataFrame =
    docs.select(
      Seq(col(idCol), redactText(col(textCol), patterns).as("redacted")) ++
        patterns.map { case (name, re) =>
          regexp_count(col(textCol), lit(re)).as(s"n_$name") }: _*)

  /** Unigram token entropy per doc, in bits — the distribution-shape
    * quality signal that length/ratio features miss: near zero for a
    * degenerate doc repeating one token, log2(n) when every token is
    * distinct. Computed as H = log2(n) - sum(c*log2 c)/n over per-doc
    * token counts (no per-token probability column), two grouped
    * aggregations: (doc, token) then (doc) — both with map-side partial
    * aggregation, so the shuffle carries one row per distinct (doc,
    * token), not per token occurrence. Docs with zero tokens emit no row
    * (entropy of an empty distribution is undefined, not 0). */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_distinct"),
        round(log2(sum("c")) - sum(col("c") * log2(col("c"))) / sum("c"), 6)
          .as("entropy_bits"))

  /** n-gram repetition ratio — the Gopher-style repetitiveness signal
    * (Rae et al. 2021 §A1.1): fraction of a doc's sequential `n`-gram
    * shingles that are repeats of an earlier shingle. Boilerplate, spam
    * and degenerate generations score high; the filter drops docs above a
    * threshold. Pure per-row map over the NON-distinct shingle stream
    * (one kernel call for total, one for distinct) — no shuffle.
    *
    * @return (id, n_ngrams, n_distinct, repetition_ratio in [0,1])
    */
  def repetitionRatio(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3): DataFrame = {
    val all = DedupOps.shingleHashes64(
      TextOps.tokens(col(textCol)), shingleN, distinct = false)
    val ded = DedupOps.shingleHashes64(
      TextOps.tokens(col(textCol)), shingleN, distinct = true)
    docs.select(col(idCol).as("doc_id"),
      size(all).cast("long").as("n_ngrams"),
      size(ded).cast("long").as("n_distinct"))
      .withColumn("repetition_ratio",
        round((col("n_ngrams") - col("n_distinct")).cast("double") /
          col("n_ngrams"), 6))
  }

  /** Winnowing fingerprint sets (Schleimer et al., SIGMOD'03): hash every
    * sequential `shingleN`-gram (60-bit md5 prefix), keep the min hash of
    * every `window`-length sliding window, dedupe + sort. Docs with fewer
    * than `window` shingles contribute their single global min.
    *
    * Relational implementation: shingles explode to (id, pos, hash) rows
    * and the sliding min is a window frame (`ROWS window-1 PRECEDING`) —
    * one shuffle on id. A pure-column version (transform over
    * array_min(slice(...))) is quadratic in the expression tree: Catalyst
    * inlines the hash-array subexpression into every window lambda and
    * re-evaluates all the md5s per window (measured 200x slower).
    *
    * @return (id, fps: array<bigint> sorted distinct)
    */
  def winnowingFingerprintSets(docs: DataFrame, idCol: String, textCol: String,
                               shingleN: Int = 4, window: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = docs.select(col(idCol).as("id"),
      posexplode(DedupOps.shingleHashes64(TextOps.tokens(col(textCol)),
        shingleN, distinct = false)).as(Seq("pos", "h")))
    val frame = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(-(window - 1), 0)
    sh.withColumn("m", min(col("h")).over(frame))
      .groupBy("id").agg(
        max(col("pos")).as("maxpos"),
        array_sort(array_distinct(
          collect_list(when(col("pos") >= window - 1, col("m"))))).as("fullfps"),
        min(col("h")).as("minh"))
      .select(col("id"),
        when(col("maxpos") >= window - 1, col("fullfps"))
          .otherwise(array(col("minh"))).as("fps"))
  }

  /** Document pairs sharing >= `minShared` winnowing fingerprints — the
    * plagiarism/overlap-detection application of the fingerprint sets
    * (Schleimer et al. SIGMOD'03 §4). Candidate generation is an equi-join
    * on the fingerprint value, like the MinHash band join; fingerprints
    * appearing in more than `maxDf` documents (boilerplate phrases) are
    * dropped first so a hot fingerprint cannot quadratically blow up the
    * bucket join — the standard df-cap that keeps this shape viable at
    * corpus scale.
    */
  def winnowedPairs(docs: DataFrame, idCol: String, textCol: String,
                    shingleN: Int = 4, window: Int = 4,
                    maxDf: Int = 50, minShared: Int = 2): DataFrame = {
    val fps = winnowingFingerprintSets(docs, idCol, textCol, shingleN, window)
      .select(col("id"), explode(col("fps")).as("fp"))
      .localCheckpoint() // reused by the df-cap aggregate and both join sides
    val hot = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf)
    val cold = fps.join(broadcast(hot), Seq("fp"), "left_anti")
    cold.as("a").join(cold.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb"))
      .groupBy("ida", "idb").agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
  }

  /** (id, n_fingerprints, fingerprint digest) — a compact winnowing sketch
    * per document; equal digests mean heavily-overlapping content. */
  def fingerprintSketch(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 4, window: Int = 4): DataFrame =
    winnowingFingerprintSets(docs, idCol, textCol, shingleN, window)
      .select(col("id").as("doc_id"), size(col("fps")).as("n_fingerprints"),
        md5(concat_ws(",", transform(col("fps"), x => x.cast("string"))))
          .as("fp_digest"))

  /** Per-doc (w1, w2) adjacent-token pairs as columns, docs with fewer
    * than 2 tokens kept with NULL pairs (they must score, as "no
    * evidence", not vanish). */
  private def docTokenPairs(docs: DataFrame, idCol: String,
                            textCol: String): DataFrame = {
    // Tokenize in a projection of its own: the pair expression below
    // references the token array 5 times, and split/trim re-evaluated
    // per reference is the dominant per-row cost. CollapseProject keeps
    // a non-cheap alias that is referenced more than once, so `toks`
    // stays a separate codegen'd projection evaluated once per doc.
    val withT = docs.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("toks"))
    val toks = col("toks")
    val pairs = when(size(toks) >= 2,
      zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    withT.select(col("doc_id"), explode_outer(pairs).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
  }

  /** N-gram language-model quality scoring — the classic perplexity
    * filter of pretraining pipelines: train an add-k-smoothed bigram LM
    * on `train` (default: the corpus itself) and score every document by
    * its average bigram log-probability,
    * `avg ln((c(w1,w2)+k) / (c(w1)+k·V))`. Low scores flag
    * gibberish/boilerplate relative to the reference corpus.
    * Returns (doc_id, n_bigrams, avg_logp(6dp)); docs under 2 tokens
    * score NULL over 0 bigrams.
    *
    * Scale: two word-keyed aggregations over the training corpus (the
    * exact model) + two word-keyed joins on the scoring side — linear,
    * shuffle-on-word-key work; the vocabulary size is one driver scalar.
    * An exact bigram table over 100 TB is itself large but stays a
    * well-partitioned join relation (never collected); if the model must
    * be bounded, feed the counts through [[graft.functions.CmsSketch]]
    * and trade exactness for fixed state. */
  def lmQualityScore(docs: DataFrame, idCol: String, textCol: String,
                     train: Option[DataFrame] = None,
                     addK: Double = 0.5): DataFrame = {
    val t = train.getOrElse(docs)
    val tPairs = docTokenPairs(t, idCol, textCol).localCheckpoint()
    val uni = t.select(explode(TextOps.tokens(col(textCol))).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("cw"))
    val vocab = uni.count() // one driver scalar, like BM25's avgdl
    val bi = tPairs.where(col("w1").isNotNull)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cbg"))
    val scored = docTokenPairs(docs, idCol, textCol)
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .withColumn("lp", when(col("w1").isNotNull,
        log((coalesce(col("cbg"), lit(0L)) + lit(addK)) /
          (coalesce(col("cw"), lit(0L)) + lit(addK) * lit(vocab.toDouble)))))
    scored.groupBy("doc_id")
      .agg(count(col("lp")).as("n_bigrams"),
        round(avg(col("lp")), 6).as("avg_logp"))
  }

  /** Bounded-state variant of [[lmQualityScore]]: the unigram and bigram
    * count relations are replaced by two count-min sketch matrices
    * ([[graft.functions.CmsSketch]], `d*w` longs EACH however large the
    * training corpus), broadcast to the scoring side as one-row
    * relations — at 100 TB the exact bigram table is itself a multi-TB
    * join side, while this model is a fixed few MB. The vocabulary size
    * stays the exact one-driver-scalar aggregate. No word-keyed join
    * remains anywhere in the plan.
    *
    * Bias direction: count-min never under-counts, so both c(w1,w2) and
    * c(w1) are OVER-estimates and an unseen bigram's numerator gets its
    * buckets' collision mass instead of 0. The net score bias is upward
    * (documents — gibberish especially — look slightly more probable
    * than under the exact model) and shrinks as `w` grows; size `w` a
    * few times the distinct-bigram count for a near-exact filter.
    */
  def lmQualityScoreBounded(docs: DataFrame, idCol: String, textCol: String,
                            train: Option[DataFrame] = None,
                            addK: Double = 0.5,
                            cmsDepth: Int = 3,
                            cmsWidth: Int = 1 << 20): DataFrame = {
    import graft.functions.CmsSketch
    val t = train.getOrElse(docs)
    // All item hashes come from the graft_shingle_hash native kernel: a
    // bigram IS a 2-shingle ("w1 w2", single-space joined), so the kernel
    // emits exactly the md5-prefix-60 values the oracle computes — but
    // straight from the token bytes, one codegen'd call per DOCUMENT,
    // replacing a per-pair md5→hex→substring→conv string chain that was
    // this query's dominant per-row cost (measured ~20x on the same
    // kernel-vs-column shape in DedupOps.shingleHashes64).
    def uniH(toks: Column): Column = DedupOps.shingleHashes64(toks, 1, distinct = false)
    def biH(toks: Column): Column = DedupOps.shingleHashes64(toks, 2, distinct = false)
    def withToks(df: DataFrame): DataFrame =
      df.select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("toks"))
    val tt = withToks(t)
    // Three training passes, each a SINGLE-GROUP aggregation: unigram
    // matrix, bigram matrix, exact vocab scalar. The vocab countDistinct
    // must NOT share an Aggregate operator with a cmsMatrix: a combined
    // agg plans through Expand with the distinct keys as grouping columns,
    // and an Aggregate that carries a TypedImperativeAggregate (the
    // d*w-long CMS buffer) materializes that buffer PER GROUP — one 6 MB
    // zero-array allocation per distinct word, hundreds of GB of pure
    // garbage at the 100x fixture (measured as this query's 2-8x
    // run-to-run swings and 47 s training stages; split, the same stages
    // run ~6 s, stable). Standalone countDistinct plans as two pure
    // codegen HashAggregates — the extra corpus pass is the cheap part.
    // The 1-row model is materialized (localCheckpoint) so reading the
    // vocab scalar on the driver does not re-run the matrix aggregations
    // when the scoring query executes.
    // size>0 guard: the kernel returns md5("") for an EMPTY token array
    // (nt < n contract), which must not enter the matrix — explode of an
    // empty array contributes nothing, matching the old explode(tokens).
    val uniCms = tt.where(size(col("toks")) > 0)
      .select(explode(uniH(col("toks"))).as("h"))
      .agg(CmsSketch.cmsMatrix(col("h"), cmsDepth, cmsWidth).as("uni"))
    val vocabDf = tt.where(size(col("toks")) > 0)
      .select(explode(col("toks")).as("w"))
      .agg(countDistinct(col("w")).as("vocab"))
    val biCms = tt.where(size(col("toks")) >= 2)
      .select(explode(biH(col("toks"))).as("h"))
      .agg(CmsSketch.cmsMatrix(col("h"), cmsDepth, cmsWidth).as("bi"))
    val model = uniCms.crossJoin(vocabDf).crossJoin(biCms).localCheckpoint()
    val vocab = model.select(col("vocab")).head.getLong(0)
    // Scoring: per doc, zip the n-1 bigram hashes with the hashes of
    // their FIRST tokens (slice keeps the arrays the same length so
    // zip_with never null-pads), explode, probe both matrices. Docs with
    // <2 tokens keep one NULL row via explode_outer — they must score as
    // "no evidence" (0 bigrams, NULL avg), not vanish. After the kernel
    // call the hot path is pure long arithmetic: permute-mod bucket +
    // element_at per depth row, no strings anywhere.
    val st = withToks(docs)
    val pairHashes = when(size(col("toks")) >= 2,
      zip_with(
        biH(col("toks")),
        uniH(slice(col("toks"), lit(1), size(col("toks")) - 1)),
        (b, u) => struct(b.as("bh"), u.as("uh"))))
      .otherwise(array().cast("array<struct<bh:bigint,uh:bigint>>"))
    val scored = st
      .select(col("doc_id"), explode_outer(pairHashes).as("p"))
      .crossJoin(broadcast(model.drop("vocab")))
      .withColumn("lp", when(col("p").isNotNull,
        log((CmsSketch.estimate(col("bi"), col("p.bh"), cmsDepth, cmsWidth)
            + lit(addK)) /
          (CmsSketch.estimate(col("uni"), col("p.uh"), cmsDepth, cmsWidth)
            + lit(addK) * lit(vocab.toDouble)))))
    scored.groupBy("doc_id")
      .agg(count(col("lp")).as("n_bigrams"),
        round(avg(col("lp")), 6).as("avg_logp"))
  }

  /** Seed-vocabulary induction for subword tokenizers: the `topK` most
    * frequent word substrings of length <= `maxPieceLen`, each weighted by
    * its containing word's corpus frequency — SentencePiece/BPE training
    * starts from exactly this "all frequent substrings" seed before
    * pruning.
    *
    * Scale shape: the substring fan-out runs on the DISTINCT-WORD relation
    * (bounded by vocabulary size, not corpus size) and multiplies by the
    * word's count — the corpus itself is touched once, by the word count.
    * A 100 TB corpus with a 10M-word vocabulary explodes 10M x len x
    * maxPieceLen substring rows, never corpus-scale rows. Top-K is a
    * TakeOrdered (two-phase), not a global sort.
    *
    * @return (piece, cnt, rank) with rank 1..topK by (cnt desc, piece asc)
    */
  def vocabInduction(docs: DataFrame, textCol: String,
                     maxPieceLen: Int = 4, topK: Int = 1000): DataFrame = {
    val words = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
    val pieces = words
      .select(col("w"), col("wc"),
        explode(sequence(lit(1), length(col("w")))).as("i"))
      .select(col("w"), col("wc"), col("i"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("w")) - col("i") + 1))).as("l"))
      .select(expr("substring(w, i, l)").as("piece"), col("wc"))
      .groupBy("piece").agg(sum(col("wc")).as("cnt"))
    pieces.orderBy(col("cnt").desc, col("piece").asc).limit(topK)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("piece").asc)))
  }

  /** Greedy longest-match subword segmentation length for every distinct
    * word: (w, n_pieces) where n_pieces is the number of vocabulary
    * pieces the word splits into (an unmatched character advances by one
    * as an UNK piece — segmentation always terminates).
    *
    * Greedy matching is data-dependent iteration, which a single Column
    * expression cannot express — so it runs as a DRIVER-BOUNDED relational
    * loop (the PageRank discipline): each round advances every active
    * word's cursor by its longest matching piece via one explode(1..L) +
    * one broadcast vocab join + one max-aggregation, with localCheckpoint
    * keeping the plan O(1). Rounds are bounded by the longest word's
    * character count, NOT corpus size, and the loop runs on the
    * DISTINCT-WORD relation — corpus-scale rows never enter it.
    */
  def segmentWordCounts(words: DataFrame, vocab: DataFrame,
                        maxPieceLen: Int = 4): DataFrame = {
    val spark = words.sparkSession
    val v = vocab.select(col("piece")).distinct()
      .withColumn("hit", lit(true)).localCheckpoint()
    var state = words.select(col("w")).distinct()
      .where(length(col("w")) > 0)
      .select(col("w"), lit(1).as("pos"), lit(0L).as("n"))
      .localCheckpoint()
    // Two jobs per round, not four: only `stepped` is materialized
    // (localCheckpoint — the lineage cut); the finished/active splits are
    // cheap filters OVER that cut, so checkpointing them separately each
    // round only added driver latency (this loop runs on the DISTINCT-WORD
    // relation, where per-round job overhead IS the cost). The final
    // result unions <= maxWordLen finished filters, each one filter deep.
    var finishedParts = List.empty[DataFrame]
    while (!state.isEmpty) {
      val stepped = state
        .select(col("w"), col("pos"), col("n"),
          explode(sequence(lit(1),
            least(lit(maxPieceLen), length(col("w")) - col("pos") + 1)))
            .as("l"))
        .withColumn("piece", expr("substring(w, pos, l)"))
        .join(broadcast(v), Seq("piece"), "left_outer")
        .groupBy("w", "pos", "n")
        .agg(coalesce(max(when(col("hit"), col("l"))), lit(1)).as("step"))
        .select(col("w"), (col("pos") + col("step")).as("pos"),
          (col("n") + 1).as("n"))
        .localCheckpoint()
      finishedParts ::= stepped.where(col("pos") > length(col("w")))
        .select(col("w"), col("n"))
      state = stepped.where(col("pos") <= length(col("w")))
    }
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false))))
    finishedParts.foldLeft(empty)(_ union _).toDF("w", "n_pieces")
  }

  /** [[segmentWordCounts]] via the `graft_segment_count` native kernel —
    * row-identical results (TextAnalysisSpec proves equality against the
    * relational loop) with the piece vocabulary held as a driver-side
    * model instead of a per-round broadcast join. A subword vocabulary is
    * topK-BOUNDED by construction (the tokenizer's model, 32k-256k pieces
    * in practice), so collecting it is the ANN-centroid shape, not a
    * corpus-scale collect; `pieces` is the already-collected model. */
  def segmentWordCountsKernel(words: DataFrame, pieces: Seq[String],
                              maxPieceLen: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.registerActive()
    words.select(col("w")).distinct()
      .where(length(col("w")) > 0)
      .withColumn("n_pieces", call_function("graft_segment_count", col("w"),
        lit(pieces.toArray), lit(maxPieceLen)))
  }

  /** Per-doc subword token count under a piece vocabulary (e.g. the
    * [[vocabInduction]] seed): segmentation runs once per DISTINCT word,
    * then rejoins the corpus — the tokenizer-accurate upgrade over
    * [[tokenCounts]]'s chars/4 approximation. */
  def subwordTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                         vocab: DataFrame,
                         maxPieceLen: Int = 4,
                         broadcastVocabLimit: Int = 1 << 20): DataFrame = {
    val tokens = docs.select(col(idCol).as("id"),
      explode(TextOps.tokens(col(textCol))).as("w"))
    // Segmentation is a pure per-word function of the piece vocabulary.
    // When the vocabulary fits the driver (it is a topK-bounded tokenizer
    // MODEL; the limit is a guard, not a truncation), segment each
    // distinct word in ONE codegen'd pass — the driver-bounded relational
    // loop (maxWordLen rounds x 2 jobs) remains solely for a vocabulary
    // too large to collect, and the two paths are row-identical
    // (TextAnalysisSpec).
    val pieceRows = vocab.select(col("piece")).distinct()
      .limit(broadcastVocabLimit + 1).collect()
    val seg =
      if (pieceRows.length <= broadcastVocabLimit)
        segmentWordCountsKernel(tokens.select(col("w")),
          pieceRows.map(_.getString(0)).toSeq.sorted, maxPieceLen)
      else segmentWordCounts(tokens.select(col("w")), vocab, maxPieceLen)
    tokens.join(seg, "w")
      .groupBy("id")
      .agg(sum(col("n_pieces")).as("n_subwords"))
      .select(col("id").as(idCol), col("n_subwords"))
  }
}
