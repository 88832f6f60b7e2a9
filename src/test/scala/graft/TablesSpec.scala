package graft

import org.apache.spark.sql.types.TimestampType

class TablesSpec extends SparkSpec {

  test("events loader scopes the nanosAsLong conf and the DF still executes") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(spark.conf.getOption(key) === before,
      "loading events must not change the session conf")
    assert(df.schema("ts").dataType === TimestampType)
    // execution happens AFTER the conf was restored — the pinned schema
    // must carry the read on its own
    assert(df.count() > 0)
  }
}
