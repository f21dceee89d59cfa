package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** MongoDB query semantics over DataFrames — the portable half of the
  * reference's Mongo source (SURVEY.md §2.1 S9/S10): `source-where`
  * parsed as a BSON filter document, `source-columns` as a projection
  * document, `source-query` as an aggregation pipeline
  * (`manager/MongoDBManager.java:120-230`).
  *
  * The transport (a real MongoDB cursor) belongs to the Spark Mongo
  * connector, which is not on this classpath; what the engine owns is
  * the TRANSLATION of Mongo query documents into Catalyst expressions,
  * so the same filter/projection/pipeline strings the reference
  * accepts drive pushdown-friendly DataFrame plans here. With the
  * connector present, these same translations become its
  * `aggregation.pipeline` options.
  *
  * Supported filter operators: implicit equality, $eq $ne $gt $gte
  * $lt $lte $in $nin $exists $regex, $and $or $nor $not.
  * Supported pipeline stages: $match $project $sort $skip $limit
  * $count $group (accumulators $sum $avg $min $max, including
  * $sum: 1 counting).
  */
object MongoShim {

  def parseJson(s: String): JValue = JsonMethods.parse(s)

  /** BSON filter document -> boolean Column. */
  def filterToColumn(doc: String): Column = filterToColumn(parseJson(doc))

  private def literal(v: JValue): Any = v match {
    case JString(s) => s
    case JInt(i) => i.toLong
    case JLong(l) => l
    case JDouble(d) => d
    case JDecimal(d) => d
    case JBool(b) => b
    case JNull => null
    case other => throw new IllegalArgumentException(s"unsupported literal: $other")
  }

  def filterToColumn(doc: JValue): Column = doc match {
    case JObject(fields) if fields.isEmpty => lit(true)
    case JObject(fields) =>
      fields.map {
        case ("$and", JArray(cs)) => cs.map(filterToColumn).reduce(_ && _)
        case ("$or", JArray(cs)) => cs.map(filterToColumn).reduce(_ || _)
        case ("$nor", JArray(cs)) => !cs.map(filterToColumn).reduce(_ || _)
        case (field, JObject(ops)) if ops.forall(_._1.startsWith("$")) =>
          ops.map { case (op, v) => opToColumn(field, op, v) }.reduce(_ && _)
        case (field, v) => col(field) === lit(literal(v))
      }.reduce(_ && _)
    case other => throw new IllegalArgumentException(s"filter must be a document, got $other")
  }

  private def opToColumn(field: String, op: String, v: JValue): Column = op match {
    case "$eq" => col(field) === lit(literal(v))
    case "$ne" => !(col(field) <=> lit(literal(v)))
    case "$gt" => col(field) > lit(literal(v))
    case "$gte" => col(field) >= lit(literal(v))
    case "$lt" => col(field) < lit(literal(v))
    case "$lte" => col(field) <= lit(literal(v))
    case "$in" => v match {
      case JArray(vs) => col(field).isin(vs.map(literal): _*)
      case _ => throw new IllegalArgumentException("$in needs an array")
    }
    case "$nin" => v match {
      case JArray(vs) => !col(field).isin(vs.map(literal): _*)
      case _ => throw new IllegalArgumentException("$nin needs an array")
    }
    case "$exists" => if (literal(v) == true) col(field).isNotNull else col(field).isNull
    case "$regex" => col(field).rlike(literal(v).toString)
    case "$not" => !filterToColumn(JObject(List(field -> v)))
    case other => throw new IllegalArgumentException(s"unsupported operator: $other")
  }

  /** BSON projection document ({f: 1/0}) -> column list application.
    * Mixed include/exclude follows Mongo rules (exclusion-only docs
    * drop fields; otherwise inclusion list). */
  def project(df: DataFrame, doc: String): DataFrame = {
    val fields = parseJson(doc) match {
      case JObject(fs) => fs.map { case (k, v) => k -> (literal(v) != 0L && literal(v) != false) }
      case other => throw new IllegalArgumentException(s"projection must be a document: $other")
    }
    if (fields.forall(!_._2)) df.drop(fields.map(_._1): _*)
    else df.select(fields.collect { case (f, true) => col(f) }: _*)
  }

  /** Aggregation pipeline (JSON array of stage documents) applied in
    * order — the reference appends $skip/$limit per task for
    * partitioning (`MongoDBManager.java:140-160`); Spark partitions
    * the scan instead, so the pipeline is applied once, whole. */
  def pipeline(df: DataFrame, pipelineJson: String): DataFrame = {
    val stages = parseJson(pipelineJson) match {
      case JArray(ss) => ss
      case other => throw new IllegalArgumentException(s"pipeline must be an array: $other")
    }
    stages.foldLeft(df)(applyStage)
  }

  private def applyStage(df: DataFrame, stage: JValue): DataFrame = stage match {
    case JObject(List(("$match", doc))) => df.filter(filterToColumn(doc))
    case JObject(List(("$project", JObject(fs)))) =>
      project(df, JsonMethods.compact(JObject(fs)))
    case JObject(List(("$sort", JObject(fs)))) =>
      df.orderBy(fs.map { case (f, dir) =>
        if (literal(dir).asInstanceOf[Long] >= 0) col(f).asc else col(f).desc }: _*)
    case JObject(List(("$skip", v))) =>
      df.offset(literal(v).asInstanceOf[Long].toInt)
    case JObject(List(("$limit", v))) =>
      df.limit(literal(v).asInstanceOf[Long].toInt)
    case JObject(List(("$count", JString(name)))) =>
      df.agg(count(lit(1)).as(name))
    case JObject(List(("$group", JObject(fields)))) => applyGroup(df, fields)
    case other => throw new IllegalArgumentException(s"unsupported stage: $other")
  }

  private def applyGroup(df: DataFrame, fields: List[(String, JValue)]): DataFrame = {
    val idExpr = fields.collectFirst { case ("_id", v) => v }
      .getOrElse(throw new IllegalArgumentException("$group requires _id"))
    def ref(v: JValue): Column = v match {
      case JString(s) if s.startsWith("$") => col(s.stripPrefix("$"))
      case other => lit(literal(other))
    }
    val aggs = fields.filterNot(_._1 == "_id").map {
      case (name, JObject(List(("$sum", JInt(i))))) if i == 1 => count(lit(1)).as(name)
      case (name, JObject(List(("$sum", v)))) => sum(ref(v)).as(name)
      case (name, JObject(List(("$avg", v)))) => avg(ref(v)).as(name)
      case (name, JObject(List(("$min", v)))) => min(ref(v)).as(name)
      case (name, JObject(List(("$max", v)))) => max(ref(v)).as(name)
      case (name, other) => throw new IllegalArgumentException(
        s"unsupported accumulator for $name: $other")
    }
    idExpr match {
      case JNull => df.agg(aggs.head, aggs.tail: _*)
      case v => df.groupBy(ref(v).as("_id")).agg(aggs.head, aggs.tail: _*)
    }
  }

  /** Merge-key discovery from `listIndexes` output — the reference's
    * unique-index selection rule (`MongoDBManager.java:431-507`):
    *
    *  1. an index counts as unique when `unique: true` OR it is the
    *     implicit `_id_` index;
    *  2. the FIRST user-defined unique index (name != `_id_`) wins;
    *     `_id_` is only kept while nothing better has appeared;
    *  3. no unique index at all (or malformed metadata) falls back to
    *     `Seq("_id")`.
    *
    * Key field order is the index's own declaration order. Input is
    * the index-metadata documents as JSON (what `listIndexes` returns
    * through any driver); with a real connector on the classpath this
    * feeds the incremental-mode merge keys. */
  def mergeKeyFromIndexes(indexDocs: Seq[String]): Seq[String] = {
    var selectedName: Option[String] = None
    var selected: Seq[String] = Nil
    indexDocs.foreach { docStr =>
      val doc = try parseJson(docStr) catch { case _: Throwable => JNothing }
      val name = doc \ "name" match { case JString(s) => s; case _ => "" }
      val isUnique = (doc \ "unique" match {
        case JBool(b) => b
        case _ => false
      }) || name == "_id_"
      val keyFields = doc \ "key" match {
        case JObject(fields) => fields.map(_._1)
        case _ => Nil
      }
      if (isUnique && keyFields.nonEmpty &&
          (selectedName.isEmpty ||
            (selectedName.contains("_id_") && name != "_id_"))) {
        selectedName = Some(name)
        selected = keyFields
      }
    }
    if (selected.isEmpty) Seq("_id") else selected
  }

  /** Sampled-union schema inference — the engine-side fix for the
    * reference's lossy first-document rule
    * (`rowset/MongoDBRowSetImpl.java:75-149`: metadata comes from doc
    * #1 only, so any field absent there is silently DROPPED for the
    * whole replication, and a null first value degrades to VARCHAR).
    *
    * Here the schema is the UNION of field sets across an `n`-document
    * sample with type widening (long → double → string, struct/array
    * recursion) — exactly Spark's distributed JSON inference, so the
    * merge rules are the battle-tested ones, run scan-parallel, and a
    * field only doc #500 carries still makes the schema. `overrides`
    * wins over inference per field (the explicit escape hatch for a
    * field the sample under-represents — e.g. always-null in the
    * sample but DECIMAL in truth) and appends fields the sample never
    * showed at all.
    *
    * Scale shape: inference cost is bounded by `n` documents
    * regardless of collection size (sample first, infer after), and
    * the result is a plain `StructType` to pass to the connector
    * read — no second full scan. */
  def inferSchema(sampleJson: org.apache.spark.sql.Dataset[String],
      n: Int = 1000,
      overrides: Map[String, org.apache.spark.sql.types.DataType] = Map.empty)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.{StructField, StructType}
    require(n >= 1, s"sample size must be >= 1: $n")
    val spark = sampleJson.sparkSession
    val inferred = spark.read.json(sampleJson.limit(n)).schema
    val patched = inferred.fields.map(f =>
      overrides.get(f.name).map(t => f.copy(dataType = t)).getOrElse(f))
    val appended = overrides.view
      .filterKeys(k => !inferred.fieldNames.contains(k))
      .map { case (name, t) => StructField(name, t, nullable = true) }
    StructType(patched ++ appended)
  }
}
