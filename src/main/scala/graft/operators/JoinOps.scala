package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks natively. */
object JoinOps {

  /** Backward as-of join: attach to every left row the most recent right
    * row with `rightTs <= leftTs` for the same key (the standard
    * market-data / state-lookup join; DuckDB spells it ASOF LEFT JOIN with
    * `left.ts >= right.ts`, which is exactly the oracle it's verified
    * against).
    *
    * Spark has no as-of join. The naive encodings are a range-condition
    * join (O(n·m) BroadcastNestedLoop blowup) or a per-left-row subquery.
    * This implementation is the scalable shape: UNION the two sides tagged,
    * sort each key's timeline once, and carry the latest right payload
    * forward with last_value(ignoreNulls) over a running window — ONE
    * shuffle on the key, linear work, no range explosion. Ties
    * (leftTs == rightTs) match, as in DuckDB's `>=` semantics.
    *
    * Right-side (key, ts) pairs must be unique — pre-aggregate duplicates —
    * otherwise "the" matching row is ambiguous in any engine.
    *
    * @param valueCols right-side payload columns attached to the output
    *                  (NULL where no right row is at or before leftTs)
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keyCol: String,
                       leftTsCol: String, rightTsCol: String,
                       valueCols: Seq[String]): DataFrame =
    asofJoin(left, right, keyCol, leftTsCol, rightTsCol, valueCols,
      forward = false)

  /** Forward as-of join: the EARLIEST right row with `rightTs >= leftTs`
    * per key (next-event lookup — "the user's next purchase after this
    * click"; DuckDB: ASOF LEFT JOIN with `left.ts <= right.ts`). Same
    * one-shuffle timeline construction as the backward join, with the
    * timeline walked in reverse. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
                      leftTsCol: String, rightTsCol: String,
                      valueCols: Seq[String]): DataFrame =
    asofJoin(left, right, keyCol, leftTsCol, rightTsCol, valueCols,
      forward = true)

  private def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
                       leftTsCol: String, rightTsCol: String,
                       valueCols: Seq[String], forward: Boolean): DataFrame = {
    val lStructType = left.select(struct(left.columns.map(col): _*).as("l"))
      .schema("l").dataType
    val rStructType = right.select(struct(valueCols.map(col): _*).as("r"))
      .schema("r").dataType

    val lTagged = left.select(
      col(keyCol).as("__k"), col(leftTsCol).as("__ts"), lit(0).as("__isR"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rStructType).as("__r"))
    val rTagged = right.select(
      col(keyCol).as("__k"), col(rightTsCol).as("__ts"), lit(1).as("__isR"),
      lit(null).cast(lStructType).as("__l"),
      struct(valueCols.map(col): _*).as("__r"))

    // backward: ascending timeline, running last right = latest at-or-
    // before. forward: DESCENDING timeline, running last right = earliest
    // at-or-after. Either way the right row sorts before the left at equal
    // ts (isR desc) so ties match — >= / <= inclusive semantics.
    val order = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(col("__k"))
      .orderBy(order, col("__isR").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__isR") === 0)
      .select(left.columns.map(c => col(s"__l.$c").as(c)) ++
        valueCols.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** Bucketized range join: every point row paired with every interval row
    * (same optional key) whose `[lo, hi]` contains the point.
    *
    * Spark plans a naive `p >= lo AND p <= hi` join condition as a
    * BroadcastNestedLoopJoin — O(|points| x |intervals|) comparisons and
    * a broadcast of a whole side. Here intervals explode to the buckets
    * of width `bucketWidth` they overlap, points map to their single
    * bucket, and the pairing becomes a plain shuffled EQUI-join on
    * (key, bucket) with the exact containment as a post-filter: work is
    * O(candidates in the same bucket), both sides shuffle-partitioned,
    * nothing broadcast. Each (point, interval) pair meets in exactly one
    * bucket (the point's), so no dedup is needed. The planner is free to
    * broadcast the (usually small) exploded-interval side — that's a fine
    * outcome; the invariant this shape buys is never a NESTED LOOP.
    *
    * Pick `bucketWidth` near the typical interval length: much smaller
    * explodes intervals into many buckets; much larger inflates
    * same-bucket candidate counts. Degenerate giant intervals (>> width)
    * fan out proportionally — cap interval length upstream if the
    * distribution is adversarial.
    *
    * Column names of the two inputs must be disjoint apart from `keyCol`
    * (checked) — the output carries both sides' columns flat.
    */
  def rangeJoin(points: DataFrame, pCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                bucketWidth: Double, keyCol: Option[String] = None): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet) -- keyCol
    require(overlap.isEmpty,
      s"points/intervals column names must be disjoint apart from the key; " +
        s"shared: ${overlap.mkString(", ")}")
    require(!points.columns.contains("__bucket") && !intervals.columns.contains("__bucket"),
      "__bucket is reserved by rangeJoin")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / bucketWidth).cast("long")
    val pB = points.withColumn("__bucket", bucketOf(col(pCol)))
    val iB = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    val joinKeys = "__bucket" +: keyCol.toSeq
    pB.join(iB, joinKeys)
      .where(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__bucket")
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Occupancy telemetry for [[rangeJoin]] — the diagnostic that explains
    * a superlinear range join. The join's candidate count is
    * `sum over (key, bucket) of n_points * n_intervals`; a fat tail in
    * that product (dense overlap regions, giant intervals fanning out)
    * is the only way the equi-join shape degrades. Runs as a SEPARATE
    * aggregation with the exact bucket mapping the join uses — the
    * production join's plan is untouched — and returns the per-bucket
    * relation (key?, __bucket, n_points, n_intervals, candidates),
    * logging a debug-level summary (total/max candidates, top bucket).
    * If a workload's occupancy stays superlinear, derive `bucketWidth`
    * from interval-length quantiles (e.g. the median from
    * [[graft.functions.QuantileSketch]]) instead of a fixed guess. */
  def rangeJoinOccupancy(points: DataFrame, pCol: String,
                         intervals: DataFrame, loCol: String, hiCol: String,
                         bucketWidth: Double,
                         keyCol: Option[String] = None): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / bucketWidth).cast("long")
    val keys = "__bucket" +: keyCol.toSeq
    val pCnt = points.select(bucketOf(col(pCol)).as("__bucket") +:
        keyCol.map(col).toSeq: _*)
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_points"))
    val iCnt = intervals.select(
        explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol))))
          .as("__bucket") +: keyCol.map(col).toSeq: _*)
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_intervals"))
    val occ = pCnt.join(iCnt, keys, "full_outer")
      .select(keys.map(col) :+
        coalesce(col("n_points"), lit(0L)).as("n_points") :+
        coalesce(col("n_intervals"), lit(0L)).as("n_intervals"): _*)
      .withColumn("candidates", col("n_points") * col("n_intervals"))
    if (log.isDebugEnabled) {
      val s = occ.agg(count(lit(1)).as("buckets"),
        coalesce(sum(col("candidates")), lit(0L)).as("total"),
        coalesce(max(col("candidates")), lit(0L)).as("worst")).head
      log.debug(s"rangeJoin occupancy (width=$bucketWidth): " +
        s"${s.getLong(0)} buckets, ${s.getLong(1)} candidate pairs, " +
        s"worst bucket ${s.getLong(2)}")
    }
    occ
  }
}
