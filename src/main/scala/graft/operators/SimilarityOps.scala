package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (array<float>): brute-force
  * cosine top-k as the exact baseline, random-hyperplane LSH bucketing as
  * the scale path, and cosine near-duplicate pairs.
  *
  * Scale design:
  *  - All vector math is pure column expressions (`zip_with` + `aggregate`)
  *    inside whole-stage codegen — no UDF boxing per element.
  *  - Brute-force top-k broadcasts the QUERY set (small) against the corpus
  *    (huge): one pass, no shuffle of the corpus, then a per-query window
  *    rank on the (corpus x queries) product — the corpus side never moves.
  *  - The hyperplane code is a per-row expression; candidate generation is
  *    an equi-join on the code, turning O(n²) into bucket-local work. The
  *    hyperplanes are md5-derived ±1 vectors, so codes are deterministic
  *    and engine-portable (no stored model needed).
  */
object SimilarityOps {

  /** Cast array<float> to array<double> for stable arithmetic. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  /** Dot product for PAIR SCANS: the native codegen expression
    * (graft.functions.DotProduct). Spark's higher-order functions
    * (aggregate/zip_with) are interpreted per element — fine once per row,
    * ~3x-10x too slow when evaluated per candidate pair. Same sequential
    * summation order as the columnar form and DuckDB's list_dot_product,
    * so results are bit-compatible. */
  private def fastDot(df: DataFrame, a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot(df.sparkSession, a, b)

  /** (id, v, nrm): vectors with their norms precomputed ONCE — pair scans
    * then do a single dot per pair instead of three. */
  private def withNorms(df: DataFrame, idCol: String, vecCol: String,
                        idAs: String, vAs: String, nrmAs: String): DataFrame =
    df.select(col(idCol).as(idAs), asDouble(col(vecCol)).as(vAs))
      .withColumn(nrmAs, sqrt(dot(col(vAs), col(vAs))))

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded). Queries broadcast; corpus stays put. */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int): DataFrame = {
    val c = withNorms(corpus, idCol, vecCol, "vec_id", "v", "nrm")
    val q = withNorms(queries, qidCol, qvecCol, "query_id", "qv", "qnrm")
    val scored = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(fastDot(c, col("qv"), col("v")) / (col("qnrm") * col("nrm")), 6)
          .as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }

  /** All near-duplicate pairs by cosine >= threshold (brute-force; the
    * LSH-bucketed variant below is the scale path). */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                         threshold: Double,
                         maxBruteRows: Long = 100000L): DataFrame = {
    // Broadcast one side as primitive arrays and scan pairs in a
    // mapPartitions kernel: a row-join materializing O(n²) boxed vector
    // pairs measured ~10x slower. mapPartitions is justified here exactly
    // as SURVEY §2.10(d) allows — a tight numeric kernel Catalyst can't
    // express. The broadcast side must fit in memory: this operator is the
    // BOUNDED brute-force baseline; LSH bucketing is the full-corpus path.
    val spark = corpus.sparkSession
    import spark.implicits._
    // ENFORCE the bound, don't document it: collecting an uncapped corpus
    // is a silent driver OOM. The cap is overridable for callers that know
    // their driver heap; past it, the answer is the LSH path, not a bigger
    // cap.
    val nRows = corpus.count()
    require(nRows <= maxBruteRows,
      s"cosineNearDupPairs is the BOUNDED brute-force baseline: corpus has " +
        s"$nRows rows > maxBruteRows=$maxBruteRows. Use the LSH-bucketed " +
        "path (SimilarityOps.lshTopK) or SemDeDup (semDedup) for full " +
        "corpora, or raise maxBruteRows if the driver heap allows.")
    val c = withNorms(corpus, idCol, vecCol, "id", "v", "nrm")
    val side = c.select(col("id"), col("v"), col("nrm"))
      .as[(Long, Seq[Double], Double)].collect()
      .map { case (i, v, n) => (i, v.toArray, n) }
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(side)
    // Spark's round() is BigDecimal HALF_UP — replicate it exactly
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    c.select(col("id"), col("v"), col("nrm"))
      .as[(Long, Seq[Double], Double)]
      .mapPartitions { it =>
        val all = bc.value
        it.flatMap { case (ida, v, nrm) =>
          val a = v.toArray
          // binary search to the first idb > ida, then scan forward
          var lo = java.util.Arrays.binarySearch(all.map(_._1), ida) match {
            case neg if neg < 0 => -neg - 1
            case pos => pos + 1
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          while (lo < all.length) {
            val (idb, b, nrmB) = all(lo)
            var s = 0.0
            var i = 0
            val n = a.length
            while (i < n) { s += a(i) * b(i); i += 1 }
            val cos = round6(s / (nrm * nrmB))
            if (cos >= threshold) out += ((ida, idb, cos))
            lo += 1
          }
          out
        }
      }
      .toDF("ida", "idb", "cos")
  }

  /** md5-derived ±1 pseudo-random hyperplane sign for (plane, dim). */
  private def planeSign(p: Column, d: Column): Column =
    when(conv(substring(md5(concat(p.cast("string"), lit(":"), d.cast("string"))),
      1, 1), 16, 10).cast("int") % 2 === 0, lit(1.0)).otherwise(lit(-1.0))

  /** LSH-bucketed approximate top-k: rank only within same-code buckets.
    * Recall < 1 by construction; trade off with `planes` (fewer planes =
    * bigger buckets = higher recall & cost). */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qidCol: String, qvecCol: String,
              k: Int, planes: Int = 8, probeBits: Int = 0): DataFrame = {
    require(probeBits >= 0 && probeBits <= planes,
      s"probeBits must be in [0, planes], got $probeBits")
    // embedding dimension read once from the data (arrays carry no length
    // in the schema); the plane literals hoist against it
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val c = withNorms(corpus, idCol, vecCol, "vec_id", "v", "nrm")
    val cc = c.withColumn("code", hyperplaneCodeFast(c, col("v"), planes, dim))
    val q0 = withNorms(queries, qidCol, qvecCol, "query_id", "qv", "qnrm")
    // multi-probe: beyond the exact code, probe the first `probeBits`
    // Hamming-distance-1 codes (flip one plane's sign bit). A vector near
    // a hyperplane lands on either side by a hair — probing the adjacent
    // buckets recovers those misses for a probeBits+1 factor of candidate
    // cost, WITHOUT growing the corpus index (the standard multi-probe
    // LSH trade; probe codes are query-side only)
    val q = if (probeBits == 0) {
      // exact-bucket path keeps its original plan shape (no Generate node)
      q0.withColumn("qcode", hyperplaneCodeFast(q0, col("qv"), planes, dim))
    } else {
      val q1 = q0.withColumn("qcode0", hyperplaneCodeFast(q0, col("qv"), planes, dim))
      val probeCodes = col("qcode0") +:
        (0 until probeBits).map(p => col("qcode0").bitwiseXOR(lit(1L << p)))
      q1.withColumn("qcode", explode(array(probeCodes: _*))).drop("qcode0")
    }
    val scored = cc.join(broadcast(q),
        col("code") === col("qcode") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(fastDot(cc, col("qv"), col("v")) / (col("qnrm") * col("nrm")), 6)
          .as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }

  /** IVF (inverted-file) approximate top-k: a coarse quantizer assigns
    * every corpus vector to its nearest centroid cell ONCE; queries probe
    * only their `nprobe` nearest cells. With `nprobe == nlist` this is
    * exhaustive and equals [[bruteForceTopK]] exactly (tested); smaller
    * nprobe trades recall for a ~nlist/nprobe scan reduction.
    *
    * The quantizer here is deterministic (centroids = the `nlist`
    * lowest-id corpus vectors — no training iterations); swapping in
    * k-means centroids changes ONLY the broadcast array. At scale the
    * cell assignment is one broadcast map pass and the probe is a
    * cell-equality join — the corpus is never shuffled per query.
    */
  /** (cell id, vector, norm) — the coarse-quantizer model shape. */
  type Centroid = (Long, Array[Double], Double)

  /** Deterministic quantizer init: the `nlist` lowest-id corpus vectors. */
  def seedCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                    nlist: Int): Array[Centroid] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    withNorms(corpus, idCol, vecCol, "vec_id", "v", "nrm")
      .orderBy("vec_id").limit(nlist)
      .select(col("vec_id"), col("v"), col("nrm"))
      .as[(Long, Seq[Double], Double)].collect()
      .map { case (i, v, n) => (i, v.toArray, norm2(v.toArray)) }
  }

  private def norm2(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  /** Spherical k-means (Lloyd) refinement of the IVF coarse quantizer:
    * assign every vector to its max-cosine centroid (the same codegen'd
    * argmax fold the probe uses), recompute each cell's centroid as the
    * element-wise mean of its members, repeat. The seeding and tie-breaks
    * are deterministic (lowest id / lowest cell), so reruns over the SAME
    * physical partitioning rebuild identical centroids; the residual
    * nondeterminism is avg()'s floating summation order, which can move a
    * centroid by an ulp under a different partition layout and flip a
    * borderline vector's cell — harmless for recall, but don't hash-gate
    * anything downstream of a trained quantizer. Each iteration is one
    * pass over the corpus + an nlist x dim aggregation — the training cost
    * a real IVF pays once at index build. Empty cells keep their previous
    * centroid. */
  def trainIvfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                        nlist: Int, iterations: Int = 5,
                        roundDecimals: Option[Int] = None): Array[Centroid] = {
    val c = withNorms(corpus, idCol, vecCol, "vec_id", "v", "nrm")
      .localCheckpoint()
    val dimRow = c.select(size(col("v"))).head(1)
    if (dimRow.isEmpty) return Array.empty // empty corpus -> empty model
    val dim = dimRow(0).getInt(0)
    // roundDecimals: quantize each recomputed centroid coordinate per
    // iteration (BigDecimal HALF_UP — the same rounding as Spark's and
    // DuckDB's round()). This resets the summation-order float noise at
    // every round, making the TRAINED model engine-portable and
    // hash-stable (the unquantized path documents why it is not); the
    // ~1e-6 coordinate loss is far below any recall-relevant scale.
    def quantize(m: Array[Double]): Array[Double] = roundDecimals match {
      case Some(d) => m.map(x =>
        BigDecimal(x).setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble)
      case None => m
    }
    var cents = seedCentroids(corpus, idCol, vecCol, nlist)
    for (_ <- 1 to iterations) {
      val assigned = c.withColumn("cell",
        nearestCellFor(c, cents, col("v"), col("nrm")))
      val meanCols = (0 until dim).map(i =>
        avg(element_at(col("v"), i + 1)).as(s"m$i"))
      val means = assigned.groupBy("cell").agg(meanCols.head, meanCols.tail: _*)
        .collect()
        .map(r => r.getLong(0) ->
          Array.tabulate(dim)(i => r.getDouble(i + 1))).toMap
      cents = cents.map { case (cid, v, n) =>
        means.get(cid) match {
          case Some(m0) => val m = quantize(m0); (cid, m, norm2(m))
          case None     => (cid, v, n) // empty cell keeps its centroid
        }
      }
    }
    cents
  }

  /** Per-centroid cosine columns against a (v, nrm) pair — centroids as
    * literal arrays so the scoring stays in whole-stage codegen. */
  private def centScoresFor(df: DataFrame, cents: Array[Centroid],
                            v: Column, nrm: Column): Seq[(Long, Column)] =
    cents.toSeq.map { case (cid, cv, cnrm) =>
      val cvLit = array(cv.map(lit).toIndexedSeq: _*)
      cid -> fastDot(df, v, cvLit) / (lit(cnrm) * nrm)
    }

  /** Argmax cell via a greatest() struct fold; ties -> lowest centroid id. */
  private def nearestCellFor(df: DataFrame, cents: Array[Centroid],
                             v: Column, nrm: Column): Column = {
    val scored = centScoresFor(df, cents, v, nrm).map { case (cid, cos) =>
      struct(cos.as("cos"), lit(-cid).as("negid"))
    }
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    -best.getField("negid")
  }

  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qidCol: String, qvecCol: String,
              k: Int, nlist: Int = 16, nprobe: Int = 4,
              centroids: Option[Array[Centroid]] = None): DataFrame = {
    val c = withNorms(corpus, idCol, vecCol, "vec_id", "v", "nrm")
    // the quantizer "model" is tiny (nlist vectors); collecting it to the
    // driver and re-entering it as LITERAL arrays keeps the per-row
    // assignment inside whole-stage codegen — no UDF boxing of
    // Seq[Double] on the corpus (huge) side. Same hoisting trick as
    // hyperplaneCodeFast. Pass `centroids` (e.g. from trainIvfCentroids)
    // to swap the quantizer without touching the plan.
    val cents = centroids.getOrElse(seedCentroids(corpus, idCol, vecCol, nlist))
    if (cents.isEmpty) {
      // empty corpus/model: zero-argument greatest() would fail analysis;
      // return the (empty) result with the contract schema instead
      import org.apache.spark.sql.types._
      return corpus.sparkSession.createDataFrame(
        corpus.sparkSession.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("query_id", LongType), StructField("vec_id", LongType),
          StructField("cos", DoubleType), StructField("rn", IntegerType))))
    }
    // assignment: argmax via the greatest() struct fold; ties -> lowest
    // centroid id, matching a first-wins maxBy and the oracle's
    // (cos DESC, cent ASC)
    val assigned = c.withColumn("cell", nearestCellFor(c, cents, col("v"), col("nrm")))
    // probe: top-nprobe cells per query via explode + window rank — the
    // query side is small by contract, so the window is cheap
    val q0 = withNorms(queries, qidCol, qvecCol, "query_id", "qv", "qnrm")
    val qScored = q0.withColumn("sc", explode(array(
      centScoresFor(q0, cents, col("qv"), col("qnrm")).map { case (cid, cos) =>
        struct(cos.as("cos"), lit(cid).as("cell"))
      }.toIndexedSeq: _*)))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("sc.cos").desc, col("sc.cell").asc)
    val q = qScored.withColumn("rc", row_number().over(wProbe))
      .where(col("rc") <= nprobe)
      .select(col("query_id"), col("qv"), col("qnrm"), col("sc.cell").as("cell"))
    val scored = assigned.join(broadcast(q),
        assigned("cell") === q("cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(fastDot(c, col("qv"), col("v")) / (col("qnrm") * col("nrm")), 6)
          .as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }

  /** Random-hyperplane LSH code, packed: Σ (v·h_p > 0) << p. Bit p is the
    * sign of the projection onto an md5-derived ±1 hyperplane — SimHash for
    * vectors; cosine-similar vectors agree on most bits.
    *
    * Column-only reference form: evaluates the md5-derived sign per
    * (row, plane, dim) through interpreted lambdas — correct but ~100x the
    * work of [[hyperplaneCodeFast]], which precomputes each plane ONCE as a
    * literal array (the planes are deterministic, so this is just hoisting)
    * and takes the projections through the native dot kernel. */
  def hyperplaneCode(v: Column, planes: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(planes - 1)), p => {
        val dims = sequence(lit(0), size(v) - 1)
        val proj = aggregate(
          zip_with(v, dims, (x, d) => x * planeSign(p, d)),
          lit(0.0), (acc, x) => acc + x)
        when(proj > 0, expr("1")).otherwise(lit(0)).cast("long") * pow(lit(2.0), p).cast("long")
      }),
      lit(0L), (acc, x) => acc + x)

  /** The same ±1 signs as [[planeSign]], computed driver-side: first md5
    * hex char of "p:d" even -> +1. */
  private[operators] def planeVector(p: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { d =>
      val b0 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$p:$d".getBytes("UTF-8"))(0)
      if (((b0 >> 4) & 0xf) % 2 == 0) 1.0 else -1.0
    }

  /** Hyperplane code with hoisted plane literals + native dot product:
    * identical values to [[hyperplaneCode]] (same signs, same sequential
    * summation order), one codegen'd dot per plane instead of per-element
    * interpreted lambdas. Needs the embedding dimension up front — one
    * schema-level fact the caller reads once, not per row. */
  def hyperplaneCodeFast(df: DataFrame, v: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { p =>
      val plane = array(planeVector(p, dim).map(lit).toIndexedSeq: _*)
      when(fastDot(df, v, plane) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  // ---- product quantization (PQ) ---------------------------------------
  // The memory-compression ANN path: vectors split into m subspaces, each
  // quantized against its own k-cell codebook, so a corpus vector becomes
  // m small ints. At 100 TB that is the difference between shipping
  // d floats and m bytes per row through every scoring scan — the
  // codebooks (m*k*dsub doubles) are a driver-side model like the IVF
  // centroids, and scoring is ADC: score(q, x) = Σ_j dot(q_j, C_j[code_j]).

  /** One subspace's codebook: cells 0..k-1 as (centroid subvector,
    * squared norm). Index j of the outer array = subspace j. */
  type PqCodebook = Array[Array[(Array[Double], Double)]]

  /** Await a concurrently-submitted driver job with a FINITE bound.
    * `Duration.Inf` here would turn a hung Spark job into a silently hung
    * driver; a generous timeout (default 30 min, `GRAFT_AWAIT_TIMEOUT_S`
    * to override — model trainings at the 100x fixture finish in minutes)
    * fails loudly instead, naming which concurrent chain stalled. */
  private[graft] lazy val awaitTimeout: scala.concurrent.duration.Duration = {
    // lazy + explicit parse: a malformed env value must fail with a message
    // naming the variable at first use, not as an opaque
    // ExceptionInInitializerError from the object's static init
    val raw = sys.env.getOrElse("GRAFT_AWAIT_TIMEOUT_S", "1800")
    val secs = raw.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"GRAFT_AWAIT_TIMEOUT_S must be an integer number of seconds, " +
        s"got '$raw'"))
    scala.concurrent.duration.Duration(secs, "s")
  }

  private[graft] def awaitOrFail[T](f: scala.concurrent.Future[T],
      what: String,
      timeout: scala.concurrent.duration.Duration = awaitTimeout): T =
    try scala.concurrent.Await.result(f, timeout)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        throw new IllegalStateException(
          s"concurrent driver job '$what' did not finish within " +
            s"$timeout — a hung Spark job chain; raise " +
            "GRAFT_AWAIT_TIMEOUT_S only if the scale genuinely needs it")
    }

  private def normSq(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    s
  }

  /** Argmin-L2 cell for a subvector via a least() struct fold — ties →
    * lowest cell. ||s−c||² ranks identically to (||c||² − 2·s·c) because
    * ||s||² is constant per row, so the fold never materializes it. */
  /** Effective PQ subspace count. A STORED model defines its own layout:
    * the number of codebooks it was trained with wins over the caller's
    * `m` parameter (the CLI `ann-topk --model` path always passes its
    * default m=2). Layout-vs-vector-width validation happens lazily
    * INSIDE the plan via [[pqDimGuard]] — no Spark job fires at
    * DataFrame-construction time, and the check holds for empty query
    * sets and the train-on-the-fly path alike. */
  private def pqModelM(books: PqCodebook): Int = books.length

  /** In-plan vector-width guard: rows whose vector is exactly `dim` wide
    * pass through unchanged; any other width raises a descriptive error
    * when the row is actually scanned (native `when`/`raise_error` —
    * codegen'd, no job at plan time, nothing on the happy path). Without
    * it a PQ layout that does not tile the embedding would silently score
    * only a vector prefix. NULL vectors pass through as NULL — corrupt/
    * missing data are data, not errors (the decode kernels' degradation
    * contract): their scores come out NULL and rank last, they never
    * abort the query. Only a present-but-wrong-width vector raises. */
  private def pqDimGuard(v: Column, dim: Int, what: String): Column =
    when(v.isNull, v).when(size(v) === lit(dim), v).otherwise(raise_error(format_string(
      s"$what vector dim=%s does not tile the PQ model layout " +
        s"(m x dsub = $dim) — the model was trained for a different " +
        "embedding width; rebuild it with `ann-build`", size(v))))

  private def nearestPqCellFor(df: DataFrame,
      book: Array[(Array[Double], Double)], sv: Column): Column = {
    val scored = book.zipWithIndex.map { case ((cv, cn2), cid) =>
      struct((lit(cn2) - lit(2.0) * fastDot(df, sv,
        array(cv.map(lit).toIndexedSeq: _*))).as("d"), lit(cid).as("cid"))
    }.toIndexedSeq
    val best = if (scored.size == 1) scored.head else least(scored: _*)
    // NULL vector -> NULL code (and downstream a NULL ADC score that
    // ranks below every real candidate). Without the guard the all-null
    // distance structs compare by cid alone and a corrupt row would be
    // coded as cell 0 — a phantom candidate with a REAL score.
    when(sv.isNull, lit(null).cast("int")).otherwise(best.getField("cid"))
  }

  /** Train per-subspace Lloyd codebooks (standard PQ, L2 assignment).
    * Seeding is the k lowest-id vectors' subvectors (cell = seed rank),
    * ties break to the lowest cell, and `roundDecimals` quantizes every
    * recomputed centroid coordinate per iteration — the same determinism
    * recipe as [[trainIvfCentroids]], so the trained model is hash-stable
    * and engine-portable (the q_ann_pq oracle re-derives it in SQL).
    * Each iteration per subspace is one corpus pass + a k×dsub
    * aggregation; empty cells keep their centroid. */
  def trainPqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                       m: Int, cells: Int, iterations: Int = 2,
                       roundDecimals: Option[Int] = Some(6),
                       inputCheckpointed: Boolean = false): PqCodebook = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // the projection is re-scanned (m subspaces) x (1 + iterations) times:
    // checkpoint it once — unless the CALLER already materialized exactly
    // this relation (ivfPqTopK's residuals), where a second checkpoint
    // would only re-copy the data
    val c0 = corpus.select(col(idCol).cast("long").as("vec_id"),
      asDouble(col(vecCol)).as("v"))
    val c = if (inputCheckpointed) c0 else c0.localCheckpoint()
    val dimRow = c.select(size(col("v"))).head(1)
    if (dimRow.isEmpty) return Array.empty
    val dim = dimRow(0).getInt(0)
    require(dim % m == 0, s"dim $dim does not split into $m subspaces")
    val dsub = dim / m
    def quantize(x: Array[Double]): Array[Double] = roundDecimals match {
      case Some(d) => x.map(v =>
        BigDecimal(v).setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble)
      case None => x
    }
    // subspaces train INDEPENDENTLY (each its own seed collect + Lloyd
    // iterations over its own slice) — run them as concurrent driver
    // threads so the m training chains overlap instead of serializing.
    // Per-subspace math, seeding, tie-breaks and rounding are untouched,
    // so the trained model is bit-identical to the sequential loop.
    import scala.concurrent.Future
    import scala.concurrent.ExecutionContext.Implicits.global
    val trained = (0 until m).map { j => Future {
      val sub = c.select(col("vec_id"),
        slice(col("v"), j * dsub + 1, dsub).as("sv"))
      var book: Array[(Array[Double], Double)] =
        sub.orderBy("vec_id").limit(cells).as[(Long, Seq[Double])]
          .collect().map { p => val a = p._2.toArray; (a, normSq(a)) }
      for (_ <- 1 to iterations) {
        val assigned = sub.withColumn("cell",
          nearestPqCellFor(sub, book, col("sv")))
        val meanCols = (0 until dsub).map(i =>
          avg(element_at(col("sv"), i + 1)).as(s"m$i"))
        val means = assigned.groupBy("cell")
          .agg(meanCols.head, meanCols.tail: _*).collect()
          .map(r => r.getInt(0) ->
            Array.tabulate(dsub)(i => r.getDouble(i + 1))).toMap
        book = book.zipWithIndex.map { case (old, cid) =>
          means.get(cid).map { m0 =>
            val mq = quantize(m0); (mq, normSq(mq))
          }.getOrElse(old)
        }
      }
      book
    }}
    trained.zipWithIndex.map { case (f, j) =>
      awaitOrFail(f, s"PQ subspace-$j codebook training") }.toArray
  }

  /** PQ-ANN top-k by asymmetric distance computation. The index-build
    * pass is the ONLY scan that reads corpus vectors — it reduces each
    * row to m int codes; the scoring scan then carries (id, codes) and
    * reconstructs Σ_j dot(q_j, C_j[code_j]) from LITERAL codebook arrays,
    * all inside whole-stage codegen (no UDF, no model broadcast — the
    * model IS the plan). Queries broadcast; the corpus never shuffles. */
  def pqTopK(corpus: DataFrame, idCol: String, vecCol: String,
             queries: DataFrame, qidCol: String, qvecCol: String,
             k: Int, m: Int = 2, cells: Int = 4, iterations: Int = 2,
             codebooks: Option[PqCodebook] = None): DataFrame = {
    val books = codebooks.getOrElse(
      trainPqCodebooks(corpus, idCol, vecCol, m, cells, iterations))
    val spark = corpus.sparkSession
    if (books.isEmpty || books.exists(_.isEmpty)) {
      import org.apache.spark.sql.types._
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("query_id", LongType),
          StructField("vec_id", LongType),
          StructField("score", DoubleType), StructField("rn", IntegerType))))
    }
    val dsub = books.head.head._1.length
    val mEff = pqModelM(books)
    // stored models guard BOTH sides in-plan (the model's layout is
    // external to this data); trained-on-the-fly models derived dsub from
    // this corpus, so only the queries need the width check
    val c = corpus.select(col(idCol).cast("long").as("vec_id"),
      (if (codebooks.isDefined)
         pqDimGuard(asDouble(col(vecCol)), mEff * dsub, "corpus")
       else asDouble(col(vecCol))).as("v"))
    val coded = c.select(col("vec_id") +: (0 until mEff).map(j =>
      nearestPqCellFor(c, books(j),
        slice(col("v"), j * dsub + 1, dsub)).as(s"code$j")): _*)
    val q = queries.select(col(qidCol).cast("long").as("query_id"),
      pqDimGuard(asDouble(col(qvecCol)), mEff * dsub, "query").as("qv"))
    val joined = coded.join(broadcast(q), col("vec_id") =!= col("query_id"))
    val score = (0 until mEff).map { j =>
      val bookLit = array(books(j).map(e =>
        array(e._1.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)
      fastDot(joined, slice(col("qv"), j * dsub + 1, dsub),
        element_at(bookLit, col(s"code$j") + 1))
    }.reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    joined.select(col("query_id"), col("vec_id"),
        round(score, 6).as("score"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }

  /** PQ-ANN with exact re-ranking: [[pqTopK]]'s ADC scan produces a
    * `shortlist`-deep candidate set per query, then ONLY those candidates'
    * full vectors are re-read and scored with exact cosine — the standard
    * two-stage retrieve-then-refine recipe (shortlist quality from the
    * compressed index, ranking quality from exact math).
    *
    * Scale design: the shortlist relation is |queries| × `shortlist` rows
    * of (query_id, vec_id) — broadcast it against the corpus, so the
    * refine stage is one corpus scan that materializes vectors for
    * candidate ids only (a broadcast semi-join fetch, not a corpus
    * shuffle), followed by a per-query window over ≤ `shortlist` rows.
    * The ADC stage's determinism (rounded scores, id tie-breaks) makes
    * the shortlist — and therefore the re-ranked result — hash-stable.
    */
  def pqTopKRerank(corpus: DataFrame, idCol: String, vecCol: String,
                   queries: DataFrame, qidCol: String, qvecCol: String,
                   k: Int, shortlist: Int, m: Int = 2, cells: Int = 4,
                   iterations: Int = 2,
                   codebooks: Option[PqCodebook] = None): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val cand = pqTopK(corpus, idCol, vecCol, queries, qidCol, qvecCol,
      k = shortlist, m = m, cells = cells, iterations = iterations,
      codebooks = codebooks)
      .select(col("query_id"), col("vec_id"))
    val c = withNorms(corpus, idCol, vecCol, "vec_id", "v", "nrm")
    val q = withNorms(queries, qidCol, qvecCol, "query_id", "qv", "qnrm")
    val joined = c.join(broadcast(cand), "vec_id").join(broadcast(q), "query_id")
    val cos = fastDot(joined, col("v"), col("qv")) / (col("nrm") * col("qnrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    joined.select(col("query_id"), col("vec_id"), round(cos, 6).as("cos"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with the trained IVF
    * quantizer, call two documents semantic duplicates when their cosine
    * within a shared cluster reaches `threshold`, and keep one canonical
    * doc (minimum id) per connected duplicate group.
    *
    * Scale design: the clustering is what bounds the quadratic — pair
    * generation is an intra-cell self-join, so cost is Σ|cell|², never
    * n²; `nlist` grows with the corpus to hold expected cell size
    * constant (the paper's recipe). Exactly-identical embeddings collapse
    * to one representative BEFORE the self-join
    * ([[DedupOps.collapseIdentical]] keyed on the vector bytes) — the
    * same duplicate-safety guard as the fuzzy text dedup family: an
    * embedding duplicated a million times would otherwise occupy one cell
    * with a 10¹²-pair join. Members rejoin relationally (identical
    * vectors are cosine-1 duplicates of their representative by
    * construction). Components come from the pointer-jumping
    * [[DedupOps.connectedComponents]] (O(log n) rounds).
    *
    * Determinism: trained centroids are coordinate-quantized per
    * iteration (`roundDecimals`), assignment ties break to the lowest
    * cell, and the pair threshold applies to the 6-decimal-rounded
    * cosine, so the result is hash-stable and oracle-comparable.
    *
    * @return (vec_id, cell, canonical_id, is_dup) for every corpus row
    */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
                    nlist: Int, threshold: Double, iterations: Int = 2,
                    roundDecimals: Option[Int] = Some(6)): DataFrame = {
    val spark = corpus.sparkSession
    val cents = trainIvfCentroids(corpus, idCol, vecCol, nlist, iterations,
      roundDecimals)
    if (cents.isEmpty) {
      import org.apache.spark.sql.types._
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("vec_id", LongType),
          StructField("cell", LongType),
          StructField("canonical_id", LongType),
          StructField("is_dup", BooleanType))))
    }
    val ided = corpus.select(col(idCol).cast("long").as("vec_id"),
      asDouble(col(vecCol)).as("v0"))
    val (reps0, membership) = DedupOps.collapseIdentical(
      ided, "vec_id", md5(to_json(struct(col("v0")))))
    val reps = reps0.select(col("vec_id"), col("v0").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val assigned = reps.withColumn("cell",
      nearestCellFor(reps, cents, col("v"), col("nrm"))).localCheckpoint()
    val pairs = assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"),
        round(fastDot(assigned, col("a.v"), col("b.v")) /
          (col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .where(col("cos") >= threshold)
    val comp = DedupOps.connectedComponents(pairs)
      .select(col("id").as("rep"), col("cluster_id"))
    // members inherit their representative's component; reps without any
    // near pair are their own canonical (and so are their members' —
    // identical vectors cluster with the rep by construction)
    membership
      .join(assigned.select(col("vec_id").as("rep"), col("cell")), "rep")
      .join(comp, Seq("rep"), "left_outer")
      .select(col("id").as("vec_id"), col("cell"),
        coalesce(col("cluster_id"), col("rep")).as("canonical_id"))
      .withColumn("is_dup", col("vec_id") =!= col("canonical_id"))
  }

  /** IVF-PQ — the standard billion-scale ANN index shape: the trained
    * coarse quantizer partitions the corpus into `nlist` cells, each
    * vector's RESIDUAL (v − centroid) is product-quantized into m codes,
    * and queries probe the top-`nprobe` cells scoring candidates by the
    * inner-product decomposition dot(q,v) ≈ dot(q, c_cell) + Σ_j
    * dot(q_j, book_j[code_j]).
    *
    * Residual quantization is what separates this from flat PQ: residuals
    * are centered near zero, so the same codebook budget carries far more
    * precision. Scale shape: the index-build pass reduces each corpus row
    * to (cell, m codes); the scoring scan ships (id, cell, codes) through
    * a cell equi-join against the broadcast probe set — centroids and
    * codebooks are LITERAL arrays (the model IS the plan, codegen'd), and
    * the corpus never shuffles. Determinism: both quantizers train with
    * per-iteration 6-decimal rounding, residual subtraction is exact FP,
    * and scores round to 6 — hash-stable and oracle-reproducible.
    */
  /** Per-vector residuals (vec_id, cell, rv) against trained coarse
    * centroids: the cell's centroid enters as a literal selected by a
    * when-chain over the (bounded) cell ids — codegen'd, no join against
    * a centroid table. */
  private def residualsFor(corpus: DataFrame, idCol: String, vecCol: String,
                           cents: Array[Centroid]): DataFrame = {
    val c = withNorms(corpus, idCol, vecCol, "vec_id", "v", "nrm")
    val assigned = c.withColumn("cell",
      nearestCellFor(c, cents, col("v"), col("nrm")))
    def centLit(cv: Array[Double]) = array(cv.map(lit).toIndexedSeq: _*)
    val centFor = cents.tail.foldLeft(
      when(col("cell") === cents.head._1, centLit(cents.head._2))) {
      case (acc, (cid, cv, _)) => acc.when(col("cell") === cid, centLit(cv))
    }
    assigned.select(col("vec_id"), col("cell"),
      zip_with(col("v"), centFor, (a, b) => a - b).as("rv"))
  }

  /** Train the residual PQ codebooks for an IVF-PQ index under
    * already-trained coarse centroids (the `ann-build --method ivfpq`
    * path — [[ivfPqTopK]] trains the same way when not given models). */
  def trainPqResidualCodebooks(corpus: DataFrame, idCol: String,
                               vecCol: String, cents: Array[Centroid],
                               m: Int, cells: Int,
                               iterations: Int = 2): PqCodebook =
    trainPqCodebooks(
      residualsFor(corpus, idCol, vecCol, cents).localCheckpoint(),
      "vec_id", "rv", m, cells, iterations)

  def ivfPqTopK(corpus: DataFrame, idCol: String, vecCol: String,
                queries: DataFrame, qidCol: String, qvecCol: String,
                k: Int, nlist: Int = 8, nprobe: Int = 2, m: Int = 2,
                cells: Int = 4, iterations: Int = 2,
                centroids: Option[Array[Centroid]] = None,
                codebooks: Option[PqCodebook] = None): DataFrame = {
    val spark = corpus.sparkSession
    def emptyResult: DataFrame = {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("query_id", LongType),
          StructField("vec_id", LongType),
          StructField("score", DoubleType), StructField("rn", IntegerType))))
    }
    val cents = centroids.getOrElse(
      trainIvfCentroids(corpus, idCol, vecCol, nlist, iterations,
        roundDecimals = Some(6)))
    if (cents.isEmpty) return emptyResult
    val resid = residualsFor(corpus, idCol, vecCol, cents).localCheckpoint()
    val books = codebooks.getOrElse(
      trainPqCodebooks(resid, "vec_id", "rv", m, cells, iterations,
        inputCheckpointed = true))
    if (books.isEmpty || books.exists(_.isEmpty)) return emptyResult
    def centLit(cv: Array[Double]) = array(cv.map(lit).toIndexedSeq: _*)
    val dsub = books.head.head._1.length
    val mEff = pqModelM(books)
    val coded = resid.select(col("vec_id") +: col("cell") +:
      (0 until mEff).map(j => nearestPqCellFor(resid, books(j),
        slice(col("rv"), j * dsub + 1, dsub)).as(s"code$j")): _*)
    // probe: top-nprobe cells by cosine (ivfTopK's rule), carrying
    // dot(qv, centroid) forward for the scoring decomposition; a stored
    // model's layout is validated in-plan against the query vectors
    // (residuals share the corpus width, so one guard covers scoring)
    val q0raw = withNorms(queries, qidCol, qvecCol, "query_id", "qv", "qnrm")
    val q0 =
      if (codebooks.isDefined)
        q0raw.withColumn("qv", pqDimGuard(col("qv"), mEff * dsub, "query"))
      else q0raw
    val qScored = q0.withColumn("sc", explode(array(
      cents.toSeq.map { case (cid, cv, cnrm) =>
        val d = fastDot(q0, col("qv"), centLit(cv))
        struct((d / (lit(cnrm) * col("qnrm"))).as("cos"),
          d.as("qdotc"), lit(cid).as("cell"))
      }.toIndexedSeq: _*)))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("sc.cos").desc, col("sc.cell").asc)
    val q = qScored.withColumn("rc", row_number().over(wProbe))
      .where(col("rc") <= nprobe)
      .select(col("query_id"), col("qv"), col("sc.cell").as("cell"),
        col("sc.qdotc").as("qdotc"))
    val joined = coded.join(broadcast(q),
      coded("cell") === q("cell") && col("vec_id") =!= col("query_id"))
    val residScore = (0 until mEff).map { j =>
      val bookLit = array(books(j).map(e =>
        array(e._1.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)
      fastDot(joined, slice(col("qv"), j * dsub + 1, dsub),
        element_at(bookLit, col(s"code$j") + 1))
    }.reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    joined.select(col("query_id"), col("vec_id"),
        round(col("qdotc") + residScore, 6).as("score"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }

  // ---- persisted ANN models: train once, probe many ----
  //
  // The trained quantizers (IVF centroids, PQ codebooks) are bounded
  // driver models — nlist x dim and m x cells x dsub doubles — but the
  // training pass that produces them scans the corpus `iterations` times.
  // A production index trains ONCE at build time and serves probes from
  // the stored model; these four functions round-trip the models through
  // manifest-committed parquet tables (atomic single-object commit, time
  // travel, the LayoutOps guarantees) so an index build survives restarts
  // and a probe job never retrains. Norms are recomputed at load — they
  // are derived values, and storing them would only create a consistency
  // obligation.

  /** Persist trained IVF centroids as a manifested table (cell, v). */
  def saveIvfModel(spark: org.apache.spark.sql.SparkSession,
                   cents: Array[Centroid], path: String): Unit = {
    import spark.implicits._
    LayoutOps.writeManifested(
      cents.toSeq.map { case (cid, v, _) => (cid, v.toSeq) }
        .toDF("cell", "v"), path, numFiles = 1)
  }

  /** Load IVF centroids saved by [[saveIvfModel]] (cells sorted by id). */
  def loadIvfModel(spark: org.apache.spark.sql.SparkSession,
                   path: String): Array[Centroid] = {
    import spark.implicits._
    LayoutOps.readManifested(spark, path)
      .select(col("cell").cast("long"), col("v"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
      .map { case (cid, v) => (cid, v.toArray, norm2(v.toArray)) }
  }

  /** Persist trained PQ codebooks as a manifested table
    * (subspace, cell, v). */
  def savePqModel(spark: org.apache.spark.sql.SparkSession,
                  books: PqCodebook, path: String): Unit = {
    import spark.implicits._
    val rows = for {
      (book, j) <- books.toSeq.zipWithIndex
      ((cv, _), cid) <- book.toSeq.zipWithIndex
    } yield (j, cid, cv.toSeq)
    LayoutOps.writeManifested(rows.toDF("subspace", "cell", "v"),
      path, numFiles = 1)
  }

  /** Load PQ codebooks saved by [[savePqModel]] (subspaces/cells sorted). */
  def loadPqModel(spark: org.apache.spark.sql.SparkSession,
                  path: String): PqCodebook = {
    import spark.implicits._
    LayoutOps.readManifested(spark, path)
      .select(col("subspace").cast("int"), col("cell").cast("int"), col("v"))
      .as[(Int, Int, Seq[Double])].collect()
      .groupBy(_._1).toArray.sortBy(_._1)
      .map { case (_, cells) =>
        cells.sortBy(_._2).map { case (_, _, v) =>
          val a = v.toArray; (a, normSq(a))
        }
      }
  }
}
