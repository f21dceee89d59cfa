package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run (fork=true → one
  * JVM), sized small so suites stay fast. taskFailures=3 mirrors a
  * real cluster's retry behavior (spark.task.maxFailures=4 there) so
  * ChaosRetrySpec can prove committer/merge/fold retry-safety; a
  * DETERMINISTIC failure still fails the job — after two extra
  * attempts — so negative-path suites are unaffected. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("graft-test", cores = 4, taskFailures = 3)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}
