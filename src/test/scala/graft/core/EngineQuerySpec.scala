package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** `source-query` splice semantics over non-JDBC sources: the user
  * query's public table name is `t1`, bridged to a per-invocation
  * unique temp view via an injected CTE (ReplicaEngine.transform). */
class EngineQuerySpec extends SparkTestBase {

  private def run(q: String) = {
    val conf = SourceConf(connect = s"${sf()}/region.parquet", query = Some(q))
    ReplicaEngine.transform(spark,
      ReplicaEngine.read(spark, conf), conf)
  }

  test("plain SELECT over t1") {
    assert(run("SELECT count(*) AS n FROM t1").collect()(0).getLong(0) == 5)
  }

  test("user WITH clause is spliced, regardless of casing and whitespace") {
    // "WITH\n  x AS (...)" is valid SQL; the splice must not require
    // a space after the keyword
    val q = "WITH\n  x AS (SELECT r_regionkey FROM t1 WHERE r_regionkey > 1)\n" +
      "SELECT count(*) AS n FROM x"
    assert(run(q).collect()(0).getLong(0) == 3)
    assert(run(q.toLowerCase).collect()(0).getLong(0) == 3)
  }

  test("a user CTE named t1 fails loudly instead of silently shadowing") {
    val e = intercept[IllegalArgumentException](
      run("WITH t1 AS (SELECT 1 AS x) SELECT * FROM t1"))
    assert(e.getMessage.contains("t1"))
    // in a LATER position it surfaces through the analyzer's
    // duplicate-CTE rejection, rethrown with the same message
    val e2 = intercept[IllegalArgumentException](
      run("WITH a AS (SELECT * FROM t1), t1 AS (SELECT 1 AS x) " +
        "SELECT * FROM a"))
    assert(e2.getMessage.contains("t1"))
    // t1 as a plain subquery ALIAS is fine — only a CTE named t1 collides
    assert(run("WITH x AS (SELECT * FROM t1) " +
      "SELECT count(*) AS n FROM (SELECT * FROM x) t1")
      .collect()(0).getLong(0) == 5)
  }

  test("the collision check is anchored: literals and scoped shadowing stay valid") {
    // a string literal containing "t1 as (" must not trip the guard
    assert(run("WITH a AS (SELECT r_regionkey FROM t1 " +
      "WHERE r_name <> 'treat t1 as (x)') SELECT count(*) AS n FROM a")
      .collect()(0).getLong(0) == 5)
    // a t1 CTE inside a SUBQUERY scope is legal shadowing, not a collision
    assert(run("WITH a AS (SELECT * FROM t1) SELECT count(*) AS n FROM " +
      "(WITH t1 AS (SELECT 1 AS x) SELECT * FROM t1) s CROSS JOIN a")
      .collect()(0).getLong(0) == 5)
  }

  test("concurrent transforms on one session do not collide on catalog state") {
    import scala.concurrent._
    import scala.concurrent.duration._
    import ExecutionContext.Implicits.global
    val counts = Await.result(Future.sequence((1 to 4).map(i => Future {
      run(s"SELECT count(*) AS n FROM t1 WHERE r_regionkey < $i")
        .collect()(0).getLong(0)
    })), 120.seconds)
    assert(counts == (1 to 4).map(_.toLong))
  }
}
