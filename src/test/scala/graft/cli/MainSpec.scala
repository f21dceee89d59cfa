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
