package graft

import graft.functions.LogSpace
import graft.operators.GraphOps
import org.apache.spark.sql.functions._

class LogSpaceSpec extends SparkSpec {
  import spark.implicits._

  test("logSumExp aggregator equals log of the sum, partition-invariant") {
    val xs = Seq(-1000.0, -1000.5, -999.0, -2000.0, Double.NegativeInfinity)
    val expected = {
      // stable scalar reference: shift by max
      val mx = xs.max
      mx + math.log(xs.map(x => math.exp(x - mx)).sum)
    }
    for (parts <- Seq(1, 3, 5)) {
      val got = xs.toDF("x").repartition(parts)
        .agg(LogSpace.logSumExp(col("x"))).head().getDouble(0)
      assert(math.abs(got - expected) < 1e-12, s"parts=$parts")
    }
    // deep-underflow regime: exp(-1000) == 0.0 in linear space, the whole
    // point of the reference's log-space arithmetic
    assert(expected < -990 && !expected.isInfinite)
  }

  test("logAdd column expression matches the aggregator pairwise") {
    val got = Seq((-1000.0, -1000.5)).toDF("a", "b")
      .select(LogSpace.logAdd(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(got - (-1000.0 + math.log1p(math.exp(-0.5)))) < 1e-12)
    val withInf = Seq((Double.NegativeInfinity, -5.0)).toDF("a", "b")
      .select(LogSpace.logAdd(col("a"), col("b"))).head().getDouble(0)
    assert(withInf === -5.0)
  }

  test("log-space PageRank matches linear-space PageRank") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L), (4L, 2L))
      .toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L, 4L, 5L).toDF("nodeid") // 5 dangling
    val linear = GraphOps.pageRank(edges, 10, vertices = Some(verts),
      numPartitions = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val logsp = GraphOps.pageRankLogSpace(edges, 10, vertices = Some(verts),
      numPartitions = 2)
      .collect().map(r => r.getLong(0) -> math.exp(r.getDouble(1))).toMap
    assert(linear.keySet === logsp.keySet)
    for ((k, v) <- linear) assert(math.abs(logsp(k) - v) < 1e-10, s"node $k")
  }
}
