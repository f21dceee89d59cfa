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
}
