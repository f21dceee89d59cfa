package graft

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR
  * and prints ONE machine-readable JSON line. A query that throws is
  * recorded as failed (no fabricated timing), excluded from the total,
  * and makes the process exit nonzero — a bench that can't fail isn't
  * a bench.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-bench")
    spark.sparkContext.setLogLevel("ERROR")
    // warm the JVM/codegen once on the smallest table so per-query
    // numbers measure the plan, not first-call classloading
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // iteration aid: SPARK_GRAFT_BENCH_ONLY=dd2_x,dd4_y limits the run
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(q => names(q._1))
      case None => SparkEntry.queries
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
      }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val ok = results.filter(_._3.isEmpty)
    val failed = results.filter(_._3.nonEmpty)
    val qs = ok.map { case (k, v, _) => jstr(k) + ":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val errs = failed.map { case (k, _, e) => jstr(k) + ":" + jstr(e.get) }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$errs,"n_ok":${ok.size},"n_failed":${failed.size},"sf":${jstr(sfDir)}}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
