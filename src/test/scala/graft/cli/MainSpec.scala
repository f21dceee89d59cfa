package graft.cli

import graft.SparkTestBase

class MainSpec extends SparkTestBase {

  test("flags map onto the reference's property keys; flags beat file values") {
    val f = java.nio.file.Files.createTempFile("graft_opts", ".properties")
    java.nio.file.Files.writeString(f,
      "source.connect=/from/file\nmode=complete\njobs=2\n")
    val props = Main.parseArgs(Array(
      s"--options-file=$f",
      "--source-connect=/from/flag",
      "--sink-connect=/out",
      "--mode=incremental",
      "--sink-key-columns=id",
      "--source.connect.parameter.ssl=true"))
    assert(props("source.connect") == "/from/flag")
    assert(props("mode") == "incremental")
    assert(props("jobs") == "2")
    assert(props("sink.key.columns") == "id")
    assert(props("source.connect.parameter.ssl") == "true")
    assertThrows[IllegalArgumentException](Main.parseArgs(Array("--bogus-flag=1")))
    assertThrows[IllegalArgumentException](Main.parseArgs(Array("stray")))
  }

  test("reference auth/format/staging/throttle flags map onto property keys") {
    val props = Main.parseArgs(Array(
      "--source-connect=jdbc:postgresql://h/db",
      "--source-user=su", "--source-password=sp",
      "--sink-connect=jdbc:oracle:thin:@h/db",
      "--sink-user=ku", "--sink-password=kp",
      "--bandwidth-throttling=512",
      "--quoted-identifiers",
      "--sink-disable-escape",
      "--source-file-format=csv",
      "--sink-file-format=orc",
      "--sink-staging-schema=stg",
      "--sink-staging-table-alias=ali"))
    assert(props("source.user") == "su" && props("source.password") == "sp")
    assert(props("sink.user") == "ku" && props("sink.password") == "kp")
    assert(props("bandwidth.throttling") == "512")
    assert(props("quoted.identifiers") == "true")
    assert(props("sink.disable.escape") == "true")
    assert(props("source.file.format") == "csv")
    assert(props("sink.file.format") == "orc")
    assert(props("sink.staging.schema") == "stg")
    assert(props("sink.staging.table.alias") == "ali")
    val conf = graft.core.Config.fromProperties(props)
    assert(conf.source.user.contains("su"))
    assert(conf.sink.password.contains("kp"))
    assert(conf.bandwidthThrottling == 512)
    assert(conf.sink.quotedIdentifiers && conf.sink.disableEscape)
    assert(conf.source.fileFormat.contains("csv"))
    assert(conf.sink.stagingSchema.contains("stg"))
    assert(conf.sink.stagingTableAlias.contains("ali"))
  }

  test("--version and --help short-circuit without requiring connects") {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Main.run(Array("--version"))
      Main.run(Array("--help"))
    }
    val printed = out.toString
    assert(printed.contains(Main.Version))
    assert(printed.contains("--bandwidth-throttling"))
    assert(printed.contains("--sink-staging-table-alias"))
  }

  test("end-to-end CLI replication: parquet source -> filtered csv sink") {
    val out = java.nio.file.Files.createTempDirectory("graft_cli").toString + "/sink"
    Main.run(Array(
      s"--source-connect=${sf()}/orders.parquet",
      "--source-columns=o_orderkey,o_orderstatus,o_totalprice",
      "--source-where=o_totalprice > 200000",
      "--mode=complete",
      s"--sink-connect=$out",
      "--sink.connect.parameter.format=csv",
      "--sink.connect.parameter.header=true"))
    val expected = spark.read.parquet(s"${sf()}/orders.parquet")
      .filter("o_totalprice > 200000").count()
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == expected)
    assert(back.columns.toSeq == Seq("o_orderkey", "o_orderstatus", "o_totalprice"))
  }

  test("dead reference options are accepted and ignored (drop-in parity)") {
    // the reference parses --sink-disable-index / --sink-analyze but no
    // manager acts on them (ToolOptions.java:196-216); a migrated script
    // using either must complete a replication unchanged here
    val out = java.nio.file.Files.createTempDirectory("graft_cli_dead").toString + "/sink"
    Main.run(Array(
      s"--source-connect=${sf()}/region.parquet",
      "--mode=complete",
      "--sink-disable-index",
      "--sink-analyze",
      s"--sink-connect=$out",
      "--sink.connect.parameter.format=csv"))
    assert(spark.read.csv(out).count() ==
      spark.read.parquet(s"${sf()}/region.parquet").count())
    // they also appear in --help, like the reference's formatter output
    assert(Main.helpText.contains("--sink-disable-index"))
    assert(Main.helpText.contains("--sink-analyze"))
  }

  test("--verbose maps to the reference's level rule and rides a replication") {
    assert(Main.verboseLevel("") == "INFO")        // bare flag: the reference's
    assert(Main.verboseLevel(null) == "INFO")      // no-arg -v null path
    assert(Main.verboseLevel("true") == "DEBUG")   // explicit =true
    assert(Main.verboseLevel("warn") == "WARN")
    assert(Main.verboseLevel("bogus") == "INFO")   // unknown level -> INFO
    // a bare --verbose parses to the empty value (-> INFO), not "true"
    assert(Main.parseArgs(Array("--verbose",
      "--sink-disable-truncate")) ==
      Map("verbose" -> "", "sink.disable.truncate" -> "true"))
    val out = java.nio.file.Files.createTempDirectory("graft_cli_v").toString + "/sink"
    Main.run(Array(
      s"--source-connect=${sf()}/region.parquet",
      "--verbose=WARN",
      s"--sink-connect=$out",
      "--sink.connect.parameter.format=csv"))
    assert(spark.read.csv(out).count() == 5)
    spark.sparkContext.setLogLevel("ERROR") // restore the test default
  }

  test("negative paths fail fast with the reference's failure semantics") {
    import graft.core.Config
    // missing required connects (ToolOptions.java:370-371)
    val e1 = intercept[IllegalArgumentException](
      Config.fromProperties(Map("sink.connect" -> "/out")))
    assert(e1.getMessage.contains("source.connect"))
    val e2 = intercept[IllegalArgumentException](
      Config.fromProperties(Map("source.connect" -> "/in")))
    assert(e2.getMessage.contains("sink.connect"))
    // bad mode string, with the reference's message (ToolOptions.java:711-726)
    val e3 = intercept[IllegalArgumentException](Config.fromProperties(
      Map("source.connect" -> "/in", "sink.connect" -> "/out",
        "mode" -> "cdc")))
    assert(e3.getMessage.contains("complete, complete-atomic or incremental"))
    // non-positive numerics (ToolOptions.java:664-676, 843-855, 900-912)
    val e4 = intercept[IllegalArgumentException](Config.fromProperties(
      Map("source.connect" -> "/in", "sink.connect" -> "/out",
        "jobs" -> "0")))
    assert(e4.getMessage.contains("jobs"))
    val e5 = intercept[IllegalArgumentException](Config.fromProperties(
      Map("source.connect" -> "/in", "sink.connect" -> "/out",
        "fetch.size" -> "-5")))
    assert(e5.getMessage.contains("fetch.size"))
    val e6 = intercept[IllegalArgumentException](Config.fromProperties(
      Map("source.connect" -> "/in", "sink.connect" -> "/out",
        "bandwidth.throttling" -> "-1")))
    assert(e6.getMessage.contains("bandwidth.throttling"))
    // conflicting source-query + projection/predicate: drop-in parity
    // with the reference, which parses all three and lets the query
    // take precedence (SqlManager.java:58-93) — a migrated script
    // passing both keeps running; we warn and IGNORE the others
    val c7 = Config.fromProperties(
      Map("source.connect" -> "/in", "sink.connect" -> "/out",
        "source.query" -> "SELECT 1", "source.columns" -> "a,b",
        "source.where" -> "a > 1"))
    assert(c7.source.query.contains("SELECT 1"))
    assert(c7.source.columns.isEmpty && c7.source.where.isEmpty,
      "query must take precedence: projection/predicate ignored")
  }

  test("--checkpoint-dir reaches the session's reliable-checkpoint " +
      "knob through a real CLI replication (verdict r11 #5)") {
    import graft.core.Checkpoints
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cli_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_cli_ckpt_out")
      .toString + "/sink"
    try {
      Main.run(Array(
        s"--source-connect=${sf()}/region.parquet",
        s"--checkpoint-dir=$ckpt",
        "--mode=complete",
        s"--sink-connect=$out",
        "--sink.connect.parameter.format=csv"))
      // the knob is live on the session every operator will consult...
      assert(spark.conf.getOption(Checkpoints.ConfKey).contains(ckpt))
      assert(spark.read.csv(out).count() == 5)
      // ...and an operator pin actually lands blocks under the root
      assert(Checkpoints.corpus(
        spark.read.parquet(s"${sf()}/region.parquet")).count() == 5)
      def filesUnder(d: java.io.File): Int =
        if (d.isDirectory) Option(d.listFiles()).map(_.map(filesUnder).sum)
          .getOrElse(0)
        else 1
      assert(filesUnder(new java.io.File(ckpt)) > 0,
        s"no checkpoint blocks under $ckpt")
      // properties-file spelling works too (same key surface as the
      // reference's options file)
      val conf = graft.core.Config.fromProperties(Map(
        "source.connect" -> "/in", "sink.connect" -> "/out",
        "checkpoint.dir" -> "hdfs://nn/ckpt"))
      assert(conf.checkpointDir.contains("hdfs://nn/ckpt"))
      // an empty value is a config error, not a silent local fallback
      val e = intercept[IllegalArgumentException](
        graft.core.Config.fromProperties(Map(
          "source.connect" -> "/in", "sink.connect" -> "/out",
          "checkpoint.dir" -> " ")))
      assert(e.getMessage.contains("checkpoint.dir"))
      assert(Main.helpText.contains("--checkpoint-dir"))
    } finally spark.conf.unset(Checkpoints.ConfKey)
  }
}
