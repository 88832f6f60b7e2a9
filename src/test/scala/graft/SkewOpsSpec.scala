package graft

import graft.operators.SkewOps
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (90% of rows) + a long tail
  private lazy val skewed = (
    (1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toLong))
    ).toDF("k", "v")

  test("saltedCollectList returns the same multiset as plain collect_list") {
    val plain = skewed.groupBy("k").agg(collect_list("v").as("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).sorted).toMap
    val salted = SkewOps.saltedCollectList(skewed, "k", "v", salts = 7)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).sorted).toMap
    assert(salted === plain)
  }

  test("saltedCountDistinct equals exact count_distinct") {
    val plain = skewed.groupBy("k").agg(count_distinct(col("v")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewOps.saltedCountDistinct(skewed, "k", "v", salts = 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("saltedJoin equals plain join") {
    val right = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "tag")
    val plain = skewed.join(right, "k")
      .groupBy("k", "tag").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val salted = SkewOps.saltedJoin(skewed, right, "k", salts = 5)
      .groupBy("k", "tag").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(salted === plain)
  }
}
