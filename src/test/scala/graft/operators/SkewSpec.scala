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

class SaltedJoinSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // 90% of fact rows hit dim key 1
  private val fact = ((1L to 900L).map(i => (i, 1L)) ++
    (901L to 1000L).map(i => (i, i % 7L))).toDF("row_id", "k")
  private val dim = (0L to 6L).map(i => (i, s"d$i")).toDF("k", "attr")

  test("salted inner join == plain inner join, row for row") {
    val plain = fact.join(dim, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), saltFrom = "row_id",
        replication = 8).collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getString(2))).toSet
    assert(salted.size == 1000 && salted == plain.map(t => (t._2, t._1, t._3)))
  }

  test("salted left join keeps unmatched fact rows exactly once") {
    val factMiss = fact.union(Seq((2000L, 99L)).toDF("row_id", "k"))
    val out = Skew.saltedJoin(factMiss, dim, Seq("k"), saltFrom = "row_id",
      replication = 4, joinType = "left")
    assert(out.count() == 1001L)
    val miss = out.filter(col("row_id") === 2000L).collect()
    assert(miss.length == 1 && miss.head.isNullAt(2))
    // full outer rejected: dim-side null handling doesn't survive salting
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, Seq("k"), "row_id", 4, "full_outer")
    }
  }

  test("the join exchange hashes on (key, salt), not key alone") {
    val plan = Skew.saltedJoin(fact, dim, Seq("k"), saltFrom = "row_id",
      replication = 8).queryExecution.executedPlan.toString
    assert(plan.contains("__salt"))
  }
}

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("exact heavy hitters == the HAVING answer, tiny capacity forcing MG churn") {
    // zipf-ish: v0 x 400, v1 x 200, v2 x 100, then a 300-value tail
    val rows = (Seq.fill(400)("v0") ++ Seq.fill(200)("v1") ++
      Seq.fill(100)("v2") ++ (1 to 300).map(i => s"tail$i"))
    val df = rows.toDF("v").repartition(7) // force multi-partition merge
    val expected = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 > rows.size * 0.05).toMap
    val out = Profiling.exactHeavyHitters(df, "v", support = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == expected)
    assert(out.keySet == Set("v0", "v1", "v2"))
    // n_total rides along
    val tot = Profiling.exactHeavyHitters(df, "v", support = 0.05)
      .select("n_total").first().getLong(0)
    assert(tot == rows.size.toLong)
  }

  test("no heavy hitters -> empty result; capacity guard rejects impossible bounds") {
    val uniform = (1 to 200).map(i => s"u$i").toDF("v")
    assert(Profiling.exactHeavyHitters(uniform, "v", support = 0.1).count() == 0L)
    intercept[IllegalArgumentException] {
      Profiling.exactHeavyHitters(uniform, "v", support = 0.1, capacity = 5)
    }
  }
}
