package graft

import graft.operators.TweetOps

/** Assignment-6 semantics on a synthetic fixture (FIXTURES.md B1 —
  * tweets2011 is cluster-only): positional timestamp slicing, malformed-row
  * tolerance, Jan/Feb whitelist, egypt/cairo filter, golden rendering.
  */
class TweetOpsSpec extends SparkSpec {
  import spark.implicits._

  private val lines = Seq(
    "1\tSun Jan 23 00:14:32 +0000 2011\talice\tprotests in Egypt today",
    "2\tSun Jan 23 00:45:00 +0000 2011\tbob\tnothing happening",
    "3\tSun Jan 23 01:05:10 +0000 2011\tcarol\tCAIRO is calm",
    "4\tMon Feb 07 23:59:59 +0000 2011\tdave\tegypt EGYPT eGyPt",
    "5\tTue Mar 01 10:00:00 +0000 2011\teve\tout of range month",
    "6\tSun Jan 23 00:50:00 +0000 2011\tfrank\ttahrir square cairo",
    "malformed line without tabs",
    "7\tbad-timestamp-but-right-cols\tgrace\tEgypt mention"
  ).toDF("value")

  test("parse drops malformed rows, keeps 4 columns") {
    val t = TweetOps.parseTsv(lines)
    assert(t.columns.toSeq === TweetOps.schemaCols)
    assert(t.count() === 7) // only the tab-less line dropped
  }

  test("hourly counts: Jan/Feb whitelist + golden rendering") {
    val t = TweetOps.parseTsv(lines)
    val all = TweetOps.hourlyCounts(t)
    val rendered = TweetOps.render(all).collect().map(_.getString(0))
    // row 5 (March) and row 7 (unparseable month name) are filtered
    assert(rendered.toSeq === Seq("1/23\t00\t3", "1/23\t01\t1", "2/07\t23\t1"))
  }

  test("egypt/cairo filter is case-insensitive, reference char-class form") {
    val t = TweetOps.parseTsv(lines)
    val egypt = TweetOps.hourlyCounts(t, Some(TweetOps.egyptPattern))
    val rendered = TweetOps.render(egypt).collect().map(_.getString(0))
    // rows 1 (egypt), 6 (cairo) in hour 00; row 3 (CAIRO) hour 01; row 4 Feb
    assert(rendered.toSeq === Seq("1/23\t00\t2", "1/23\t01\t1", "2/07\t23\t1"))
  }
}
