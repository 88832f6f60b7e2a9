package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series operators: the assignment-6 family of the reference
  * (hourly tweet counts, regex-filtered variant, per-group top-k).
  *
  * Reference semantics:
  *  - hourly counts = group by (month, day, hour) of a parsed timestamp,
  *    count rows (reference/assignment6/src/main/ExtractHourlyCountsAll.java;
  *    Pig equivalent assignment6/assignment6.md:7-27)
  *  - the "egypt" variant first applies a case-insensitive regex filter on
  *    the message (ExtractHourlyCountsEgypt.java:44)
  *  - per-source top-k uses a bounded priority queue per group
  *    (ExtractTopPersonalizedPageRankNodes.java:75-117) — here a window
  *    rank, which Spark executes with a single shuffle on the partition key.
  *
  * The reference's RFC-822 string surgery (month-name mapping, substring
  * slicing, ExtractHourlyCountsEgypt.java:46-73) is replaced by native
  * timestamp functions: the events table carries a real TimestampType, so
  * month/day/hour are codegen'd field extractions, and the grouping
  * benefits from partial aggregation. A date-formatting helper reproduces
  * the reference's "M/dd \t HH" rendering for golden-file parity.
  */
object TimeSeriesOps {

  /** (month, day, hour, cnt) tumbling hourly counts. */
  def hourlyCounts(events: DataFrame, tsCol: String): DataFrame =
    events
      .groupBy(
        month(col(tsCol)).as("m"),
        dayofmonth(col(tsCol)).as("d"),
        hour(col(tsCol)).as("h"))
      .agg(count(lit(1)).as("cnt"))

  /** Hourly counts restricted by a case-insensitive regex on `filterCol` —
    * the reference's egypt|cairo filter (ExtractHourlyCountsEgypt.java:44).
    * The filter is a pushed-down predicate: it runs before the shuffle.
    */
  def hourlyCountsFiltered(events: DataFrame, tsCol: String,
                           filterCol: String, pattern: String): DataFrame =
    hourlyCounts(events.where(col(filterCol).rlike(pattern)), tsCol)

  /** Reference golden rendering: "M/dd<tab>HH<tab>count" (hourly-counts-all.txt). */
  def renderHourly(hourly: DataFrame): DataFrame =
    hourly.select(
      concat_ws("\t",
        concat_ws("/", col("m"), lpad(col("d"), 2, "0")),
        lpad(col("h"), 2, "0"),
        col("cnt")).as("line"))

  /** Top-k rows per group by a value column, deterministic tiebreak — T4. */
  def topKPerGroup(df: DataFrame, groupCol: String, valueCol: String,
                   tieCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).desc, col(tieCol).asc)
    df.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }

  /** Rolling per-key window statistics over the last `frame` rows
    * (inclusive), ordered by (ts, tie) for a deterministic frame under
    * timestamp ties — SQL window frames (ROWS BETWEEN n PRECEDING AND
    * CURRENT ROW), one shuffle on the key. */
  def rollingStats(events: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, valueCol: String, frame: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(-(frame - 1), 0)
    events.select(col(keyCol), col(tieCol),
      round(avg(col(valueCol)).over(w), 6).as("roll_avg"),
      round(max(col(valueCol)).over(w), 6).as("roll_max"),
      count(lit(1)).over(w).as("roll_n"))
  }

  /** Daily counts pivoted to one column per event type. Values are passed
    * EXPLICITLY: at scale an implicit pivot runs an extra distinct job over
    * the full table just to discover column names. */
  def dailyTypePivot(events: DataFrame, tsCol: String, typeCol: String,
                     types: Seq[String]): DataFrame =
    events
      .groupBy(month(col(tsCol)).as("m"), dayofmonth(col(tsCol)).as("d"))
      .pivot(typeCol, types)
      .agg(count(lit(1)))

  /** JSON property extraction + aggregation: mean of `$.k` per event type.
    * The JSON path evaluates inside codegen (get_json_object); no UDF. */
  def jsonKStats(events: DataFrame, typeCol: String, propsCol: String): DataFrame =
    events
      .withColumn("k", get_json_object(col(propsCol), "$.k").cast("double"))
      .groupBy(typeCol)
      .agg(count(col("k")).as("n_with_k"),
        round(avg(col("k")), 6).as("mean_k"),
        round(min(col("k")), 6).as("min_k"),
        round(max(col("k")), 6).as("max_k"))

  /** Exponentially time-decayed sum per key — the standard recency-weighted
    * feature (decayed click counts, decayed spend): each value is weighted
    * 2^(-age/halfLife) relative to `refEpochUs`. Unlike an EMA recurrence
    * this form is a plain SUM of independent terms, so it keeps partial
    * aggregation (map-side combine) and needs no ordering.
    */
  def timeDecayedSum(events: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String, halfLifeMinutes: Double,
                     refEpochUs: Long): DataFrame = {
    val ageUs = lit(refEpochUs) - unix_micros(col(tsCol))
    val w = exp(lit(-math.log(2.0) / (halfLifeMinutes * 60e6)) * ageUs.cast("double"))
    events.groupBy(keyCol)
      .agg(count(lit(1)).as("n"),
        round(sum(col(valueCol) * w), 6).as("decayed_sum"),
        round(sum(w), 6).as("decayed_count"))
  }

  /** Sessionize events per user: gap > `gapMinutes` starts a new session.
    * A classic large-scale log-pipeline operator (window lag + running sum —
    * two passes over one shuffle partitioning, no self-join).
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    // microsecond arithmetic: unix_timestamp() floors to seconds, which
    // misclassifies gaps within one second of the threshold
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("prev_ts")) > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_ts", "new_session")
  }
}
