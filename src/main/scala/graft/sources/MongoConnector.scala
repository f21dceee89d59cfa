package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{ReplicationMode, SinkConf, SourceConf}

/** MongoDB transport wiring (reference `MongoDBManager.java:120-334`):
  * the connector-present half that [[MongoShim]]'s pure translation
  * layer was designed to feed.
  *
  * The Spark MongoDB connector (`format("mongodb")`, class
  * `com.mongodb.spark.sql.connector.MongoTableProvider`) is not on
  * this container's classpath, so the testable surface is the OPTION
  * ASSEMBLY — pure functions from the engine's Source/Sink conf to the
  * connector's option map, including the reference's semantics:
  *
  *  - `source-where` (BSON filter doc) and `source-columns` become a
  *    `$match`/`$project` aggregation pipeline
  *    (`MongoDBManager.java:120-163`);
  *  - `source-query` is a raw aggregation pipeline passed through
  *    (`MongoDBManager.java:165-180`);
  *  - complete mode drops and rewrites the collection; incremental
  *    mode replace-upserts on the merge key (reference
  *    `mergeStagingTable`, `MongoDBManager.java:509-560`), with the
  *    key from `SinkConf.keyColumns` or
  *    [[MongoShim.mergeKeyFromIndexes]] when index metadata is at
  *    hand (`_id` fallback).
  *
  * `read`/`write` activate only when the connector is loadable and
  * fail with a clear message otherwise.
  */
object MongoConnector {

  val ProviderClass = "com.mongodb.spark.sql.connector.MongoTableProvider"

  def available: Boolean =
    try { Class.forName(ProviderClass); true } catch { case _: Throwable => false }

  /** `[{"$match": ...}, {"$project": ...}]` from the reference's
    * filter/projection inputs, or the raw `source-query` pipeline
    * untouched. Empty string = no pipeline option. */
  def pipelineJson(where: Option[String], columns: Option[Seq[String]],
      query: Option[String]): String = query match {
    case Some(q) => q.trim match {
      case p if p.startsWith("[") => p
      case stage => s"[$stage]" // single stage document
    }
    case None =>
      val stages =
        where.map(w => s"""{"$$match": ${w.trim}}""").toSeq ++
          columns.filter(_.nonEmpty).map(cs =>
            s"""{"$$project": {${cs.map(c => s""""$c": 1""").mkString(", ")}}}""")
      if (stages.isEmpty) "" else stages.mkString("[", ", ", "]")
  }

  /** Database from the URI path (`mongodb://host/db`), overridable via
    * the `database` option. */
  def databaseOf(connect: String, options: Map[String, String]): Option[String] =
    options.get("database").orElse {
      val path = new java.net.URI(connect).getPath
      Option(path).map(_.stripPrefix("/")).filter(_.nonEmpty)
    }

  def readOptions(conf: SourceConf): Map[String, String] = {
    val base = Map("connection.uri" -> conf.connect) ++
      databaseOf(conf.connect, conf.options).map("database" -> _) ++
      conf.table.map("collection" -> _)
    val pipe = pipelineJson(conf.where, conf.columns, conf.query)
    val withPipe = if (pipe.nonEmpty) base + ("aggregation.pipeline" -> pipe) else base
    withPipe ++ (conf.options - "database")
  }

  /** Write options per mode: complete = replace the collection;
    * incremental = replace-upsert on the merge key (the reference's
    * staging merge collapses to the connector's idFieldList upsert). */
  def writeOptions(conf: SinkConf): Map[String, String] = {
    val keys = if (conf.keyColumns.nonEmpty) conf.keyColumns else Seq("_id")
    val base = Map("connection.uri" -> conf.connect) ++
      databaseOf(conf.connect, conf.options).map("database" -> _) ++
      conf.table.map("collection" -> _)
    val modeOpts = conf.mode match {
      case ReplicationMode.Incremental =>
        Map("operationType" -> "replace", "idFieldList" -> keys.mkString(","))
      case _ => Map("operationType" -> "replace")
    }
    base ++ modeOpts ++ (conf.options - "database")
  }

  def read(spark: SparkSession, conf: SourceConf): DataFrame = {
    require(available, s"MongoDB source needs the Spark MongoDB connector " +
      s"($ProviderClass) on the classpath")
    spark.read.format("mongodb").options(readOptions(conf)).load()
  }

  def write(df: DataFrame, conf: SinkConf): Unit = {
    require(available, s"MongoDB sink needs the Spark MongoDB connector " +
      s"($ProviderClass) on the classpath")
    val mode = conf.mode match {
      case ReplicationMode.Incremental => "append"
      case _ => "overwrite" // complete / complete-atomic: replace collection
    }
    df.write.format("mongodb").options(writeOptions(conf)).mode(mode).save()
  }
}
