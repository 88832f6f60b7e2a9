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

  test("rangeJoin equals the brute-force inequality join for any bucket width") {
    val points = (0 until 200).map(i => (i.toLong, i * 0.7)).toDF("pid", "p")
    val intervals = Seq(
      (1L, 5.0, 12.0), (2L, 11.9, 12.1), (3L, 50.0, 130.0), // long interval
      (4L, 200.0, 300.0), (5L, -10.0, -1.0)                 // no matches
    ).toDF("iid", "lo", "hi")
    val brute = points.join(intervals,
        col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(0.5, 7.0, 1000.0)) {
      val got = JoinOps.rangeJoin(points, "p", intervals, "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === brute, s"bucketWidth=$w")
    }
    // keyed variant: matches must also agree on the key
    val kp = points.withColumn("k", col("pid") % 2)
    val ki = intervals.withColumn("k", col("iid") % 2)
    val bruteK = kp.join(ki, col("p") >= col("lo") && col("p") <= col("hi") &&
        kp("k") === ki("k"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotK = JoinOps.rangeJoin(kp, "p", ki, "lo", "hi", 7.0, keyCol = Some("k"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotK === bruteK)
  }

  test("rangeJoinOccupancy: per-bucket candidate products account for the " +
      "join's exact pre-filter candidate count") {
    val points = (0 until 200).map(i => (i.toLong, i * 0.7)).toDF("pid", "p")
    val intervals = Seq(
      (1L, 5.0, 12.0), (2L, 11.9, 12.1), (3L, 50.0, 130.0),
      (4L, 200.0, 300.0), (5L, -10.0, -1.0)
    ).toDF("iid", "lo", "hi")
    for (w <- Seq(0.5, 7.0, 1000.0)) {
      // ground truth: candidates the equi-join actually meets = pairs
      // agreeing on the point's bucket (each pair meets in EXACTLY one)
      val trueCands = points
        .withColumn("__b", floor(col("p") / w).cast("long"))
        .join(intervals.withColumn("__b",
          explode(sequence(floor(col("lo") / w).cast("long"),
            floor(col("hi") / w).cast("long")))), "__b")
        .count()
      val occ = JoinOps.rangeJoinOccupancy(points, "p",
        intervals, "lo", "hi", w)
      val total = occ.agg(sum(col("candidates"))).head.getLong(0)
      assert(total === trueCands, s"width=$w")
      // a fat-tailed width choice shows up as one worst bucket carrying
      // most of the candidate mass — the signal the telemetry exists for
      val worst = occ.agg(max(col("candidates"))).head.getLong(0)
      assert(worst <= total)
    }
    // keyed variant partitions occupancy by key too
    val kp = points.withColumn("k", col("pid") % 2)
    val ki = intervals.withColumn("k", col("iid") % 2)
    val occK = JoinOps.rangeJoinOccupancy(kp, "p", ki, "lo", "hi", 7.0,
      keyCol = Some("k"))
    assert(occK.columns.toSeq ===
      Seq("__bucket", "k", "n_points", "n_intervals", "candidates"))
    assert(occK.where(col("candidates") > 0).count() > 0)
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
