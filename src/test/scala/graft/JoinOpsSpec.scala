package graft

import graft.operators.JoinOps
import org.apache.spark.sql.functions._

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new java.sql.Timestamp(m * 60000L)

  test("backward as-of join: latest match, tie matches, no-match is NULL") {
    val left = Seq(
      (1L, 10L, ts(5)),   // before any right row -> NULL
      (2L, 10L, ts(10)),  // tie with right at ts(10) -> matches 100.0
      (3L, 10L, ts(25)),  // between right rows -> latest is ts(20)=200.0
      (4L, 10L, ts(40)),  // after all -> 300.0
      (5L, 99L, ts(50))   // key with no right rows at all -> NULL
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts(10), 100.0), (10L, ts(20), 200.0), (10L, ts(30), 300.0)
    ).toDF("user_id", "ts", "v")

    val got = JoinOps.asofJoinBackward(left, right, "user_id", "ts", "ts", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got === Map(1L -> None, 2L -> Some(100.0), 3L -> Some(200.0),
      4L -> Some(300.0), 5L -> None))
  }

  test("forward as-of join: earliest following match, tie matches, none after is NULL") {
    val left = Seq(
      (1L, 10L, ts(5)),   // before all rights -> earliest following = 100.0
      (2L, 10L, ts(10)),  // tie with right at ts(10) -> matches 100.0
      (3L, 10L, ts(25)),  // next right is ts(30) -> 300.0
      (4L, 10L, ts(40)),  // after all rights -> NULL
      (5L, 99L, ts(50))   // key with no right rows -> NULL
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts(10), 100.0), (10L, ts(20), 200.0), (10L, ts(30), 300.0)
    ).toDF("user_id", "ts", "v")

    val got = JoinOps.asofJoinForward(left, right, "user_id", "ts", "ts", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got === Map(1L -> Some(100.0), 2L -> Some(100.0), 3L -> Some(300.0),
      4L -> None, 5L -> None))
  }

  test("as-of join output keeps every left row exactly once") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("ts"))
    val right = Tables.events(spark, "/root/testdata/sf0.001")
      .where(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max(col("value")).as("v"))
    val joined = JoinOps.asofJoinBackward(ev, right, "user_id", "ts", "ts", Seq("v"))
    assert(joined.count() === ev.count())
    assert(joined.select("event_id").distinct().count() === ev.count())
  }
}
