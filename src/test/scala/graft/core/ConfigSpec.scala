package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  test("properties parse into source/sink confs with passthrough options") {
    val conf = Config.fromProperties(Map(
      "source.connect" -> "jdbc:postgresql://h/db",
      "source.table" -> "t_source",
      "source.columns" -> "a, b ,c",
      "source.where" -> "a > 0",
      "sink.connect" -> "file:///tmp/out",
      "mode" -> "incremental",
      "sink.key.columns" -> "a",
      "jobs" -> "8",
      "fetch.size" -> "1000",
      "source.connect.parameter.ssl" -> "true"))
    assert(conf.source.columns.contains(Seq("a", "b", "c")))
    assert(conf.source.partitions == 8)
    assert(conf.source.fetchSize == 1000)
    assert(conf.source.options == Map("ssl" -> "true"))
    assert(conf.sink.mode == ReplicationMode.Incremental)
    assert(conf.sink.keyColumns == Seq("a"))
  }

  test("env interpolation substitutes ${VAR} and rejects undefined vars") {
    assert(Config.interpolateEnv("jdbc:x://${H}/db", Map("H" -> "host1")) ==
      "jdbc:x://host1/db")
    assertThrows[IllegalArgumentException](
      Config.interpolateEnv("${UNDEFINED_XYZ}", Map.empty))
  }

  test("mode parsing accepts the reference's three modes only") {
    assert(ReplicationMode.parse("complete") == ReplicationMode.Complete)
    assert(ReplicationMode.parse("complete-atomic") == ReplicationMode.CompleteAtomic)
    assert(ReplicationMode.parse("Incremental") == ReplicationMode.Incremental)
    assertThrows[IllegalArgumentException](ReplicationMode.parse("cdc"))
  }

  test("missing source.connect fails fast") {
    assertThrows[IllegalArgumentException](
      Config.fromProperties(Map("sink.connect" -> "x")))
  }

  test("scheme dispatch recognizes supported connectors") {
    import ConnectorRegistry._
    assert(kindOf("jdbc:derby:memory:x") == Jdbc)
    assert(kindOf("/data/x.parquet") == File)
    assert(kindOf("file:///data/x.csv") == File)
    assert(kindOf("s3a://bucket/key") == S3)
    assert(kindOf("kafka://broker:9092/topic") == Kafka)
    assert(kindOf("mongodb://h/db") == Mongo)
    assert(kindOf("mongodb+srv://cluster/db") == Mongo)
    assertThrows[IllegalArgumentException](kindOf("ftp://nope"))
  }
}
