package graft

import graft.functions.GraftFunctions
import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("native graft_dot matches the columnar aggregate form exactly") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((Seq.fill(64)(rnd.nextDouble()), Seq.fill(64)(rnd.nextDouble())))
    val df = rows.toDF("a", "b")
    val got = df.select(
      GraftFunctions.dot(spark, col("a"), col("b")).as("native"),
      SimilarityOps.dot(col("a"), col("b")).as("columnar")).collect()
    got.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("graft_dot is registered for SQL use and null-safe") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .head().getDouble(0)
    assert(r === 11.0)
    val n = spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d))")
      .head()
    assert(n.isNullAt(0))
  }

  test("graft_dot participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    // literal inputs constant-fold to a LocalTableScan; a parquet-backed
    // column makes the expression execute inside the codegen'd stage
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .select(expr("graft_dot(v, v)").as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // the '*(n)' prefix marks operators inside a WholeStageCodegen stage
    assert(plan.split("\n").exists(l => l.contains("graft_dot") && l.trim.startsWith("*")),
      s"graft_dot not inside a codegen stage:\n$plan")
    assert(df.head().getDouble(0) > 0.0)
  }
}
