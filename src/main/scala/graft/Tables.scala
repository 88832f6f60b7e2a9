package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * At cluster scale these would be catalog tables (partitioned parquet /
  * iceberg); here each table is a single parquet file per scale factor.
  * All readers go through `spark.read.parquet` so Catalyst gets parquet
  * footer stats, predicate pushdown and column pruning for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.parquet's `ts` physical type has varied across driver testdata
    * generations — INT64 TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects without the nanosAsLong legacy conf), and plain TIMESTAMP
    * micros without UTC adjustment (which Spark 4 infers as TIMESTAMP_NTZ).
    * Normalize every representation to session-zoned TimestampType so the
    * whole engine (unix_micros, watermarks, window functions) sees ONE
    * type: nanos -> integral division (double division would lose precision
    * at 1e18 nanos); NTZ -> cast, which under the engine's pinned UTC
    * session timezone preserves the wall-clock micros bit-for-bit.
    *
    * The legacy conf is needed at schema-inference time (read.parquet below)
    * AND at scan execution; we pin the inferred LongType schema with an
    * explicit `.schema(...)` so later executions don't depend on the session
    * conf, and restore the previous conf value before returning — loading
    * events must not change how unrelated reads in the same session behave.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try {
      val raw = load(s, d, "events")
      raw.schema("ts").dataType match {
        case LongType =>
          // re-read with the inferred schema pinned explicitly: execution of
          // THIS DataFrame then works whatever the session conf says later
          s.read.schema(raw.schema).parquet(s"$d/events.parquet")
            .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      }
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
