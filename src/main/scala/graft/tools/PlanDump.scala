package graft.tools

import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/** Dump `.explain("formatted")` for named SparkEntry queries to files —
  * the plan evidence the optimization rounds commit under `plans/`.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <q1,q2,...|all>
  * Reads the data dir from SPARK_GRAFT_SF_DIR (same contract as Bench).
  * Each query `q` writes `<outDir>/<q>_<suffix>.txt`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: PlanDump <outDir> <suffix> <q1,q2,...|all>")
    val Array(outDir, suffix, list) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    val names: Seq[String] =
      if (list == "all") SparkEntry.queries.map(_._1).toSeq
      else list.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      SparkEntry.queries.find(_._1 == name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some((_, fn)) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
              plan.getBytes("UTF-8"))
            println(s"[plandump] wrote $name")
          } catch {
            case e: Throwable =>
              System.err.println(s"[plandump] $name FAILED: $e")
          }
      }
    }
    spark.stop()
  }
}
