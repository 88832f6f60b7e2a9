package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Assignment-6 tweet-table semantics: 4-column TSV with RFC-822-style
  * timestamps, parsed positionally, hourly counts rendered `M/dd\tHH\tcount`
  * (reference/assignment6/src/main/ExtractHourlyCountsEgypt.java:38-79;
  * golden shape assignment6/hourly-counts-all.txt).
  *
  * Reference behaviors reproduced:
  *  - malformed rows (fewer than 4 tab-separated fields) are silently
  *    dropped (ExtractHourlyCountsEgypt.java:40-42)
  *  - month handled by NAME ("Jan"/"Feb" whitelist — anything else is
  *    filtered, :53-58); day/hour taken as string fields, hour zero-padded
  *  - the month is rendered as its NUMBER with no padding, day keeps its
  *    two-digit form, so `1/23  00  32171`
  */
object TweetOps {

  val schemaCols = Seq("id", "timestamp", "user", "message")

  /** Parse raw TSV lines into the 4-column tweet table, dropping malformed
    * rows like the reference does. */
  def parseTsv(lines: DataFrame): DataFrame = {
    val c = split(col(lines.columns.head), "\t")
    lines.select(c.as("f"))
      .where(size(col("f")) >= 4)
      .select((0 until 4).map(i => col("f").getItem(i).as(schemaCols(i))): _*)
  }

  /** Positional RFC-822-ish timestamp fields: "EEE MMM dd HH:mm:ss Z yyyy"
    * -> (monthName, day, hour). No timezone math — the reference slices
    * strings, so we slice strings. */
  private def tsFields(ts: Column): (Column, Column, Column) = {
    // get() (not getItem): tolerate short/garbled timestamps with NULL,
    // which the month whitelist then drops — reference behavior
    // (ExtractHourlyCountsEgypt.java:77-79); getItem throws under ANSI mode
    val parts = split(ts, " ")
    (get(parts, lit(1)), get(parts, lit(2)), substring(get(parts, lit(3)), 1, 2))
  }

  /** Hourly tweet counts, Jan/Feb only, reference rendering
    * `M/dd \t HH \t count`, ordered chronologically. */
  def hourlyCounts(tweets: DataFrame, messageFilter: Option[String] = None): DataFrame = {
    val filtered = messageFilter match {
      case Some(p) => tweets.where(col("message").rlike(p))
      case None => tweets
    }
    val (mon, day, hour) = tsFields(col("timestamp"))
    filtered
      .select(mon.as("mon"), day.as("day"), hour.as("hour"))
      .where(col("mon").isin("Jan", "Feb"))
      .withColumn("m", when(col("mon") === "Jan", lit(1)).otherwise(lit(2)))
      .groupBy("m", "day", "hour").agg(count(lit(1)).as("cnt"))
      .orderBy("m", "day", "hour")
  }

  /** Golden rendering: `M/dd\tHH\tcount` lines. */
  def render(hourly: DataFrame): DataFrame =
    hourly.select(concat_ws("\t",
      concat_ws("/", col("m"), col("day")), col("hour"), col("cnt")).as("line"))

  /** The reference's egypt/cairo filter, exact character-class form
    * (ExtractHourlyCountsEgypt.java:44). */
  val egyptPattern = ".*([Ee][Gg][Yy][Pp][Tt]|[Cc][Aa][Ii][Rr][Oo]).*"
}
