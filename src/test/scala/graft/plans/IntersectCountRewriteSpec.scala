package graft.plans

import graft.SparkTestBase
import graft.functions.TextExpressions.SortedIntersectCount

class IntersectCountRewriteSpec extends SparkTestBase {
  import spark.implicits._

  private def withRule[A](body: => A): A = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved :+ IntersectCountRewrite
    try body finally spark.experimental.extraOptimizations = saved
  }

  private def hasMergeScan(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(
      _.expressions.exists(_.exists(_.isInstanceOf[SortedIntersectCount])))

  test("size(array_intersect) over sorted-distinct longs rewrites to merge scan") {
    withRule {
      // spark.range, not a literal Seq: a LocalRelation would be
      // constant-folded away before the extra-optimizations batch runs
      val df = spark.range(3)
        .selectExpr("id", "array(id, id + 1, 1L) AS a", "array(id, 2L) AS b")
        .selectExpr("id",
          "size(array_intersect(array_sort(array_distinct(a)), array_sort(array_distinct(b)))) AS n")
        .orderBy("id")
      assert(hasMergeScan(df), df.queryExecution.optimizedPlan.toString)
      assert(df.collect().map(_.getInt(1)).toSeq == Seq(1, 2, 1))
    }
  }

  test("custom (descending) comparator is not rewritten and stays correct") {
    withRule {
      val df = Seq((Array(3L, 1L, 2L), Array(2L, 3L, 9L))).toDF("a", "b")
        .selectExpr(
          """size(array_intersect(
            |  array_sort(array_distinct(a), (l, r) -> int(sign(r - l))),
            |  array_sort(array_distinct(b), (l, r) -> int(sign(r - l))))) AS n""".stripMargin)
      assert(!hasMergeScan(df))
      assert(df.collect().head.getInt(0) == 2)
    }
  }

  test("without provable distinctness there is no rewrite") {
    withRule {
      val df = Seq((Array(1L, 1L, 2L), Array(1L, 2L))).toDF("a", "b")
        .selectExpr("size(array_intersect(array_sort(a), array_sort(b))) AS n")
      assert(!hasMergeScan(df))
      // array_intersect dedups its output: the answer is 2, not 3
      assert(df.collect().head.getInt(0) == 2)
    }
  }

  test("non-long element types are left untouched") {
    withRule {
      val df = Seq((Array("x", "y"), Array("y", "z"))).toDF("a", "b")
        .selectExpr(
          "size(array_intersect(array_sort(array_distinct(a)), array_sort(array_distinct(b)))) AS n")
      assert(!hasMergeScan(df))
      assert(df.collect().head.getInt(0) == 1)
    }
  }
}
