package graft.operators

import graft.SparkTestBase

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // heavy-hitter fixture: key "hot" owns 90% of rows
  private val skewed = ((1 to 900).map(i => ("hot", i % 50)) ++
    (1 to 100).map(i => (s"k${i % 10}", i))).toDF("k", "v")

  test("salted count equals plain count") {
    val expected = skewed.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == expected)
  }

  test("salted sum equals plain sum") {
    val expected = skewed.groupBy("k").agg(org.apache.spark.sql.functions.sum("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedSum(skewed, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == expected)
  }

  test("salted distinct count is exact (values co-located by hash)") {
    val expected = skewed.groupBy("k")
      .agg(org.apache.spark.sql.functions.countDistinct("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCountDistinct(skewed, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == expected)
  }
}
