package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the pre-shuffle technique for joins
  * repeated on the same key at scale: both sides bucketed on the join key
  * join with NO exchange at query time (the shuffle was paid once at
  * write). This is the engine's answer to the reference's custom
  * partitioners + non-splittable SequenceFiles (SURVEY S4/G10).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables sort-merge join without any exchange") {
    val dir = "/root/testdata/sf0.001"
    Tables.orders(spark, dir).write.mode("overwrite")
      .bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    Tables.customer(spark, dir).write.mode("overwrite")
      .bucketBy(4, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      // force a shuffle-join plan so the bucketing (not broadcast) is what
      // eliminates the exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      // and it computes the same result as the plain join
      val expected = Tables.orders(spark, dir).join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
