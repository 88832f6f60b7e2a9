package graft

import graft.plans.ApproxDistinctRewrite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The approx-distinct rule tests run on a CHILD session
  * (`newSession()` = fresh session state over the shared context) with the
  * rule attached via `experimental.extraOptimizations` — same injection
  * point the production `GraftPlanExtensions` uses, without disturbing the
  * shared test session.
  */
class ApproxDistinctSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSpec.session.newSession()
    s.experimental.extraOptimizations = Seq(ApproxDistinctRewrite)
    s
  }

  test("rule off by default: exact distinct, no sketch in the plan") {
    val df = spark.range(10000).selectExpr("id % 500 AS g", "id AS v")
      .groupBy("g").agg(count_distinct(col("v")).as("d"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("$Agg"),
      "sketch must not appear with the conf off")
    assert(df.where(col("d") =!= 20).count() === 0)
  }

  test("with the conf on, count_distinct rewrites to the KMV sketch") {
    spark.conf.set(ApproxDistinctRewrite.confKey, "true")
    try {
      // below k the sketch is exact — the rewrite must not change results
      val small = spark.range(10000).selectExpr("id % 500 AS g", "id AS v")
        .groupBy("g").agg(count_distinct(col("v")).as("d"))
      assert(small.queryExecution.optimizedPlan.toString.contains("$Agg"),
        small.queryExecution.optimizedPlan.toString)
      assert(small.where(col("d") =!= 20).count() === 0)

      // above k it approximates: within 15% at 40x k
      val big = spark.range(10000).selectExpr("0 AS g", "id AS v")
        .groupBy("g").agg(count_distinct(col("v")).as("d"))
      val est = big.head().getLong(1)
      assert(math.abs(est - 10000) / 10000.0 < 0.15, s"est=$est")
    } finally spark.conf.set(ApproxDistinctRewrite.confKey, "false")
  }

  test("sketch size is conf-tunable: tiny k degrades accuracy, stays exact below k") {
    spark.conf.set(ApproxDistinctRewrite.confKey, "true")
    spark.conf.set(ApproxDistinctRewrite.kConfKey, "16")
    try {
      val below = spark.range(10).selectExpr("0 AS g", "id AS v")
        .groupBy("g").agg(count_distinct(col("v")).as("d"))
      assert(below.head().getLong(1) === 10L, "exact below k")
    } finally {
      spark.conf.set(ApproxDistinctRewrite.confKey, "false")
      spark.conf.unset(ApproxDistinctRewrite.kConfKey)
    }
  }

  test("impl=hll selects the constant-state HLL sketch") {
    spark.conf.set(ApproxDistinctRewrite.confKey, "true")
    spark.conf.set(ApproxDistinctRewrite.implConfKey, "hll")
    try {
      val df = spark.range(10000).selectExpr("0 AS g", "id AS v")
        .groupBy("g").agg(count_distinct(col("v")).as("d"))
      assert(df.queryExecution.optimizedPlan.toString.contains("$Agg"))
      val est = df.head().getLong(1)
      // p = log2(256) = 8 -> sigma ~ 6.5%; 3 sigma bound
      assert(math.abs(est - 10000) / 10000.0 < 0.20, s"est=$est")
    } finally {
      spark.conf.set(ApproxDistinctRewrite.confKey, "false")
      spark.conf.unset(ApproxDistinctRewrite.implConfKey)
    }
  }

  test("schema is unchanged by the rewrite (still bigint)") {
    spark.conf.set(ApproxDistinctRewrite.confKey, "true")
    try {
      val df = spark.range(100).selectExpr("id % 3 AS g", "id AS v")
        .groupBy("g").agg(count_distinct(col("v")).as("d"))
      assert(df.schema("d").dataType === org.apache.spark.sql.types.LongType)
    } finally spark.conf.set(ApproxDistinctRewrite.confKey, "false")
  }

  test("GraftPlanExtensions wires the rule through SparkSessionExtensions") {
    // buildOptimizerRules is private[sql]; constructing + applying proves
    // the injection callback is well-formed (it throws on bad wiring)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftPlanExtensions().apply(ext)
  }
}
