package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ReplicationMode, SinkConf, SourceConf}

/** The Spark MongoDB connector is not on this classpath, so the option
  * assembly (conf -> connector option map, filter/projection ->
  * aggregation pipeline) is the testable surface — same discipline as
  * BulkLoadSpec. */
class MongoConnectorSpec extends AnyFunSuite {
  import MongoConnector._

  test("filter and projection become a $match/$project pipeline") {
    val p = pipelineJson(Some("""{"age": {"$gt": 30}}"""),
      Some(Seq("name", "age")), None)
    assert(p == """[{"$match": {"age": {"$gt": 30}}}, {"$project": {"name": 1, "age": 1}}]""")
    assert(pipelineJson(None, None, None) == "")
    assert(pipelineJson(Some("""{"a": 1}"""), None, None) == """[{"$match": {"a": 1}}]""")
  }

  test("source-query passes a raw pipeline through; single stage is wrapped") {
    val raw = """[{"$match": {"a": 1}}, {"$limit": 5}]"""
    assert(pipelineJson(Some("""{"x": 1}"""), Some(Seq("c")), Some(raw)) == raw)
    assert(pipelineJson(None, None, Some("""{"$match": {"a": 1}}""")) ==
      """[{"$match": {"a": 1}}]""")
  }

  test("database resolves from the URI path with option override") {
    assert(databaseOf("mongodb://h:27017/shop", Map.empty).contains("shop"))
    assert(databaseOf("mongodb://h:27017/shop", Map("database" -> "other"))
      .contains("other"))
    assert(databaseOf("mongodb://h:27017", Map.empty).isEmpty)
  }

  test("read options carry uri, database, collection and the pipeline") {
    val opts = readOptions(SourceConf(connect = "mongodb://h/shop",
      table = Some("orders"), where = Some("""{"status": "A"}""")))
    assert(opts("connection.uri") == "mongodb://h/shop")
    assert(opts("database") == "shop")
    assert(opts("collection") == "orders")
    assert(opts("aggregation.pipeline") == """[{"$match": {"status": "A"}}]""")
  }

  test("incremental write upserts on the merge key; complete replaces") {
    val inc = writeOptions(SinkConf(connect = "mongodb://h/shop",
      table = Some("orders"), mode = ReplicationMode.Incremental,
      keyColumns = Seq("order_id", "line")))
    assert(inc("operationType") == "replace")
    assert(inc("idFieldList") == "order_id,line")
    // no keys declared: the reference's _id fallback
    val incDefault = writeOptions(SinkConf(connect = "mongodb://h/shop",
      table = Some("orders"), mode = ReplicationMode.Incremental))
    assert(incDefault("idFieldList") == "_id")
    val complete = writeOptions(SinkConf(connect = "mongodb://h/shop",
      table = Some("orders"), mode = ReplicationMode.Complete))
    assert(!complete.contains("idFieldList"))
  }

  test("registry routes mongodb schemes; transport fails clearly without the jar") {
    import graft.core.ConnectorRegistry
    assert(ConnectorRegistry.kindOf("mongodb://h/db") == ConnectorRegistry.Mongo)
    assert(ConnectorRegistry.kindOf("mongodb+srv://c/db") == ConnectorRegistry.Mongo)
    assert(!available)
    val e = intercept[IllegalArgumentException](
      MongoConnector.read(null, SourceConf(connect = "mongodb://h/db")))
    assert(e.getMessage.contains("connector"))
  }
}
