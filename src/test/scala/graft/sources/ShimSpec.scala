package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class MongoShimSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    (1L, "alice", 30, "us"),
    (2L, "bob", 25, "de"),
    (3L, "carol", 35, "us"),
    (4L, "dave", 25, "fr"),
    (5L, null.asInstanceOf[String], 40, "us")).toDF("id", "name", "age", "country")

  test("implicit equality and comparison operators") {
    assert(df.filter(MongoShim.filterToColumn("""{"country": "us"}"""))
      .count() == 3)
    assert(df.filter(MongoShim.filterToColumn("""{"age": {"$gt": 25, "$lt": 40}}"""))
      .select("id").as[Long].collect().toSet == Set(1L, 3L))
    assert(df.filter(MongoShim.filterToColumn("""{"age": {"$ne": 25}}"""))
      .count() == 3)
  }

  test("$in, $exists, $regex, $or, $not") {
    assert(df.filter(MongoShim.filterToColumn("""{"country": {"$in": ["de", "fr"]}}"""))
      .count() == 2)
    assert(df.filter(MongoShim.filterToColumn("""{"name": {"$exists": false}}"""))
      .select("id").as[Long].head() == 5L)
    assert(df.filter(MongoShim.filterToColumn("""{"name": {"$regex": "^[ab]"}}"""))
      .count() == 2)
    assert(df.filter(MongoShim.filterToColumn(
      """{"$or": [{"country": "de"}, {"age": {"$gte": 40}}]}""")).count() == 2)
    assert(df.filter(MongoShim.filterToColumn("""{"age": {"$not": {"$lt": 30}}}"""))
      .count() == 3)
  }

  test("projection documents include or exclude") {
    assert(MongoShim.project(df, """{"id": 1, "name": 1}""").columns.toSeq ==
      Seq("id", "name"))
    assert(MongoShim.project(df, """{"age": 0}""").columns.toSeq ==
      Seq("id", "name", "country"))
  }

  test("aggregation pipeline: match, group, sort, limit") {
    val out = MongoShim.pipeline(df,
      """[
        {"$match": {"age": {"$gte": 25}}},
        {"$group": {"_id": "$country", "n": {"$sum": 1}, "avg_age": {"$avg": "$age"}}},
        {"$sort": {"n": -1, "_id": 1}},
        {"$limit": 2}
      ]""")
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("us", 3L), ("de", 1L)))
  }

  test("$count and global $group (null _id)") {
    assert(MongoShim.pipeline(df, """[{"$count": "total"}]""").first().getLong(0) == 5L)
    val g = MongoShim.pipeline(df,
      """[{"$group": {"_id": null, "max_age": {"$max": "$age"}}}]""").first()
    assert(g.getInt(0) == 40)
  }

  test("unsupported operators fail loudly, not silently") {
    assertThrows[IllegalArgumentException](
      MongoShim.filterToColumn("""{"loc": {"$geoWithin": {}}}"""))
    assertThrows[IllegalArgumentException](
      MongoShim.pipeline(df, """[{"$lookup": {}}]"""))
  }

  test("merge-key discovery prefers the first user unique index over _id_") {
    val idIdx = """{"name": "_id_", "key": {"_id": 1}}"""
    val userUnique = """{"name": "u_email", "unique": true,
                        "key": {"email": 1, "tenant": 1}}"""
    val laterUnique = """{"name": "u_code", "unique": true, "key": {"code": 1}}"""
    val nonUnique = """{"name": "ix_age", "key": {"age": 1}}"""
    // compound field order preserved from the index declaration
    assert(MongoShim.mergeKeyFromIndexes(Seq(idIdx, nonUnique, userUnique, laterUnique))
      == Seq("email", "tenant"))
    // only _id_: it is implicitly unique
    assert(MongoShim.mergeKeyFromIndexes(Seq(idIdx, nonUnique)) == Seq("_id"))
    // _id_ listed after the user index must not displace it
    assert(MongoShim.mergeKeyFromIndexes(Seq(userUnique, idIdx)) == Seq("email", "tenant"))
    // nothing unique / malformed metadata falls back to _id
    assert(MongoShim.mergeKeyFromIndexes(Seq(nonUnique)) == Seq("_id"))
    assert(MongoShim.mergeKeyFromIndexes(Seq("not json at all")) == Seq("_id"))
    assert(MongoShim.mergeKeyFromIndexes(Nil) == Seq("_id"))
  }

  test("sampled-union schema inference recovers fields doc #1 lacks; override wins") {
    import org.apache.spark.sql.types._
    // the reference's first-document rule would lock the schema to
    // {_id, name} and drop score/tags/nested for the whole replication
    val docs = Seq(
      """{"_id": 1, "name": "a"}""",
      """{"_id": 2, "name": "b", "score": 3}""",
      """{"_id": 3, "score": 2.5, "tags": ["x", "y"]}""",
      """{"_id": 4, "nested": {"k": "v"}, "score": null}""").toDS()
    val schema = MongoShim.inferSchema(docs)
    def typeOf(f: String) = schema(f).dataType
    assert(schema.fieldNames.toSet ==
      Set("_id", "name", "score", "tags", "nested"))
    assert(typeOf("_id") == LongType)
    // widening: int 3 union double 2.5 union null -> double
    assert(typeOf("score") == DoubleType)
    assert(typeOf("tags") == ArrayType(StringType))
    assert(typeOf("nested") == StructType(Seq(StructField("k", StringType))))

    // override beats inference per field, and appends unseen fields
    val forced = MongoShim.inferSchema(docs, overrides = Map(
      "score" -> DecimalType(10, 2), "audit_ts" -> TimestampType))
    assert(forced("score").dataType == DecimalType(10, 2))
    assert(forced("audit_ts").dataType == TimestampType)
    assert(forced("name").dataType == StringType) // untouched fields keep inference

    // the sample bound is honored: n=1 degrades to the reference rule
    val firstOnly = MongoShim.inferSchema(docs, n = 1)
    assert(firstOnly.fieldNames.toSet == Set("_id", "name"))

    assertThrows[IllegalArgumentException](MongoShim.inferSchema(docs, n = 0))
  }
}

class ObjectPerRowSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("writes one object per row with key and body from columns") {
    val base = java.nio.file.Files.createTempDirectory("graft_objrow").toString
    val df = Seq(("a.txt", "alpha"), ("sub/b.txt", "beta")).toDF("key", "body")
    ObjectPerRowSink.write(df, base, "key", "body")
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(base, "a.txt")) == "alpha")
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(base, "sub/b.txt")) == "beta")
  }

  test("binary bodies and null keys/bodies") {
    val base = java.nio.file.Files.createTempDirectory("graft_objrow2").toString
    val df = Seq(
      ("bin.dat", Some(Array[Byte](1, 2, 3))),
      ("empty.dat", None),
      (null.asInstanceOf[String], Some(Array[Byte](9)))).toDF("key", "body")
    ObjectPerRowSink.write(df, base, "key", "body")
    assert(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(base, "bin.dat")).toSeq == Seq[Byte](1, 2, 3))
    assert(java.nio.file.Files.size(java.nio.file.Paths.get(base, "empty.dat")) == 0)
    assert(new java.io.File(base).listFiles().count(_.isFile) == 2)
  }
}

class ThrottleSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.Throttle

  test("row throttling paces the pipe to roughly the configured rate") {
    val df = (1 to 200).toDF("v").coalesce(1)
    val t0 = System.nanoTime()
    assert(Throttle.byRows(df, 2000).count() == 200)
    // 200 rows at 2000 rows/s with a 1s burst bucket: fast but bounded
    val unthrottled = System.nanoTime()
    val slow = Throttle.byRows((1 to 600).toDF("v").coalesce(1), 400)
    assert(slow.count() == 600)
    val elapsed = (System.nanoTime() - unthrottled) / 1e9
    // 600 rows at 400/s minus the 400-permit initial burst -> >= ~0.4s
    assert(elapsed > 0.3, s"expected pacing, took ${elapsed}s")
  }

  test("row size estimation counts strings and binary payloads") {
    val r = org.apache.spark.sql.Row(1L, "abcd", Array[Byte](1, 2))
    assert(Throttle.estimateRowBytes(r) == 8 + 8 + 8 + 6)
  }

  test("ReplicaEngine.replicate honors bandwidthThrottling end-to-end") {
    import graft.core.{ReplConf, ReplicationMode, SinkConf, SourceConf}
    // ~112 bytes/row x 30 rows on ONE partition at 1 KB/s: the 1024-B
    // burst bucket absorbs ~9 rows, the remaining ~2.3 KB must be
    // paced at 1 KB/s -> the replication cannot finish in under ~1.5s
    val src = java.nio.file.Files.createTempDirectory("graft_thr").toString
    val sink = src + "/sink"
    spark.range(30).coalesce(1)
      .selectExpr("id", "repeat('x', 100) AS pad")
      .write.parquet(src + "/src")
    val conf = ReplConf(
      SourceConf(connect = src + "/src"),
      SinkConf(connect = sink, mode = ReplicationMode.Complete),
      bandwidthThrottling = 1)
    val t0 = System.nanoTime()
    graft.core.ReplicaEngine.replicate(spark, conf)
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(spark.read.parquet(sink).count() == 30)
    assert(elapsed > 1.5, s"throttled replicate finished in ${elapsed}s — cap not applied")
    // and the same replicate unthrottled is fast: the pacing above is
    // the throttle, not fixture overhead
    val t1 = System.nanoTime()
    graft.core.ReplicaEngine.replicate(spark,
      conf.copy(bandwidthThrottling = 0,
        sink = conf.sink.copy(connect = src + "/sink2")))
    assert((System.nanoTime() - t1) / 1e9 < 1.5)
  }
}
