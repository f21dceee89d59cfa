package graft.core

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The reliable-checkpoint knob (verdict-r10 #2): corpus-sized pins
  * are executor-local by default (fast; executor loss fails the job)
  * and become reliable filesystem checkpoints when
  * `spark.graft.checkpointDir` is set — both ways asserted here, on
  * the helper and through a real operator that uses it. */
class CheckpointsSpec extends SparkTestBase {

  private def df = spark.range(0, 1000).select(
    col("id"), (col("id") % 7).as("k"))

  test("default (conf unset): localCheckpoint — lineage truncated, no files") {
    spark.conf.unset(Checkpoints.ConfKey)
    val out = Checkpoints.corpus(df)
    // truncated plan: the materialized block scan, not the range
    assert(out.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
    assert(out.count() == 1000)
    // localCheckpoint leaves the global checkpoint dir untouched
    // (nothing written to any reliable store)
    assert(out.rdd.getCheckpointFile.isEmpty)
  }

  test("conf set: reliable checkpoint lands under spark.graft.checkpointDir") {
    val dir = Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set(Checkpoints.ConfKey, dir)
    try {
      val out = Checkpoints.corpus(df)
      assert(out.count() == 1000)
      // blocks are on the shared store: files exist under the dir
      def filesUnder(d: java.io.File): Int =
        if (d.isDirectory) d.listFiles().map(filesUnder).sum else 1
      assert(filesUnder(new java.io.File(dir)) > 0,
        s"no checkpoint files under $dir")
      // and the data survives plan re-execution identically
      assert(out.agg(sum("id")).head.getLong(0) == 499500L)

      // a second checkpoint reuses the bound dir (no rebind per call)
      val again = Checkpoints.corpus(df.filter(col("k") === 0))
      assert(again.count() == 143)

      // a conf CHANGE rebinds: the next pin lands under the NEW root,
      // never the stale one (the session-race class from review — a
      // "reliable" checkpoint must not land on another root)
      val dir2 = Files.createTempDirectory("graft_ckpt2").toString
      spark.conf.set(Checkpoints.ConfKey, dir2)
      val moved = Checkpoints.corpus(df.filter(col("k") === 1))
      assert(moved.count() == 143)
      assert(filesUnder(new java.io.File(dir2)) > 0,
        s"checkpoint did not follow the conf change to $dir2")
      assert(spark.sparkContext.getCheckpointDir.exists(_.contains(
        new java.io.File(dir2).getName)),
        s"context still bound to the stale root: " +
          s"${spark.sparkContext.getCheckpointDir}")
    } finally {
      spark.conf.unset(Checkpoints.ConfKey)
    }
  }

  test("root compare is URI-qualified: file:-form, bare, and relative " +
      "spellings of one root share one binding (review r11)") {
    val dir = Files.createTempDirectory("graft_ckpt_uri").toString
    spark.conf.set(Checkpoints.ConfKey, dir)
    try {
      assert(Checkpoints.corpus(df).count() == 1000)
      val bound = spark.sparkContext.getCheckpointDir.get
      // the scheme-qualified spelling of the SAME root must not rebind
      // (a bare-path compare would strip file:/ and still match here,
      // but hdfs://nn/x vs file:/x is the hazard — assert the
      // qualified compare by exercising the explicit-scheme spelling)
      spark.conf.set(Checkpoints.ConfKey, "file:" + dir)
      assert(Checkpoints.corpus(df.filter(col("k") === 2)).count() == 143)
      assert(spark.sparkContext.getCheckpointDir.get == bound,
        "file:-qualified same root must not rebind")
      // a RELATIVE root qualifies against the fs working dir and stays
      // bound: two pins -> one UUID subdir, not one per call
      val relName = "graft_ckpt_rel_probe"
      val relAbs = new java.io.File(relName).getAbsoluteFile
      try {
        spark.conf.set(Checkpoints.ConfKey, relName)
        assert(Checkpoints.corpus(df.filter(col("k") === 3)).count() == 143)
        assert(Checkpoints.corpus(df.filter(col("k") === 4)).count() == 143)
        val uuidDirs = Option(relAbs.listFiles()).map(_.count(_.isDirectory))
        assert(uuidDirs.contains(1),
          s"relative root must bind once, found $uuidDirs UUID dirs")
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(relAbs)
      }
    } finally spark.conf.unset(Checkpoints.ConfKey)
  }

  test("an operator that pins through the knob works both ways (CC frontier)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (5L, 5L))
      .toDF("id_a", "id_b")
    // driverCcMaxEdges=0 forces the distributed star-contraction loop
    // (the branch whose frontier pins through the knob)
    def run() = graft.operators.Dedup.clusters(edges, driverCcMaxEdges = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    spark.conf.unset(Checkpoints.ConfKey)
    val local = run()
    val dir = Files.createTempDirectory("graft_ckpt_cc").toString
    spark.conf.set(Checkpoints.ConfKey, dir)
    try {
      val reliable = run()
      assert(local == reliable)
      assert(local == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
        10L -> 10L, 11L -> 10L, 5L -> 5L))
    } finally spark.conf.unset(Checkpoints.ConfKey)
  }
}
