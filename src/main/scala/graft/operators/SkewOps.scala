package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys.
  *
  * When NOT to use these: aggregations with partial aggregation (count,
  * sum, min, max, avg) already combine map-side — a hot key costs one
  * partial value per task, not a hot shuffle partition, and AQE
  * (`spark.sql.adaptive.skewJoin`) re-splits skewed JOIN partitions at
  * runtime. Reach for explicit salting only where neither helps:
  * buffer-building aggregations (collect_list/collect_set, percentile
  * sketches) whose per-key state is as big as the data, or a shuffle join
  * against a side AQE can't split.
  */
object SkewOps {

  /** Deterministic per-row salt from the hash of ALL columns. A salt from
    * `monotonically_increasing_id()` (or `rand()`) is nondeterministic
    * upstream of a shuffle: on stage retry the recomputed rows pick
    * different salts than the shuffle files already fetched, silently
    * duplicating or dropping rows. Hashing row content is retry-stable;
    * duplicate rows share a salt, which only costs salting efficiency,
    * never correctness. */
  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salts))

  /** Two-stage salted aggregation for buffer-building aggregates:
    * stage 1 groups on (key, salt) — the hot key's rows spread over
    * `salts` partitions and build bounded buffers; stage 2 merges the
    * per-salt buffers per key. `merge` must be associative over `agg`'s
    * output (e.g. agg = collect_list, merge = flatten(collect_list)).
    */
  def saltedAgg(df: DataFrame, keyCol: String, salts: Int,
                agg: Column => Column, valueCol: String,
                merge: Column => Column): DataFrame =
    df.withColumn("__salt", rowSalt(df, salts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(agg(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(merge(col("__partial")).as(valueCol))

  /** Salted collect_list: order within the result is NOT defined (it never
    * is across a shuffle) — callers needing order must sort the array. */
  def saltedCollectList(df: DataFrame, keyCol: String, valueCol: String,
                        salts: Int = 16): DataFrame =
    saltedAgg(df, keyCol, salts, collect_list, valueCol,
      p => flatten(collect_list(p)))

  /** Salted exact distinct count: stage 1 dedupes within (key, salt) — the
    * hot key's dedup state is split `salts` ways — stage 2 dedupes the
    * (already distinct-per-salt) union and counts. Salting by the VALUE
    * hash keeps equal values in one salt so cross-salt overlap is zero and
    * stage 2 is a plain count. */
  def saltedCountDistinct(df: DataFrame, keyCol: String, valueCol: String,
                          salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(col(valueCol)), lit(salts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count_distinct(col(valueCol)).as("__d"))
      .groupBy(col(keyCol))
      .agg(sum(col("__d")).as(s"${valueCol}_distinct"))

  /** Replicated-broadcast salted join for a skewed LEFT against a small-ish
    * right: right is replicated `salts` times with a salt column, left rows
    * pick a salt from their id hash — the hot key's left rows spread over
    * `salts` reduce partitions instead of one. Only for joins AQE skew
    * handling can't fix (e.g. a forced shuffle join); prefer plain
    * `broadcast(right)` whenever right fits in memory. */
  def saltedJoin(left: DataFrame, right: DataFrame, keyCol: String,
                 salts: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("__salt", rowSalt(left, salts))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(keyCol, "__salt")).drop("__salt")
  }
}
