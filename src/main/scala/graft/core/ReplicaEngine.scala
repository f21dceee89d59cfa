package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{FileConnector, JdbcConnector, KafkaSink, MongoConnector}

/** Connector registry + mode orchestration — the Spark re-expression
  * of the reference's `ManagerFactory` scheme dispatch
  * (`manager/ManagerFactory.java:30-68`) and `ReplicaDB.processReplica`
  * lifecycle (`ReplicaDB.java:76-339`, SURVEY.md §3).
  *
  * A replication is: read source (partitioned) -> optional projection/
  * filter/query -> write sink under a replication mode. The entire
  * pre/post-task machinery of the reference collapses into the
  * connector write paths (staging + merge/swap live in JdbcConnector).
  */
object ConnectorRegistry {

  sealed trait Kind
  case object Jdbc extends Kind
  case object File extends Kind
  case object Kafka extends Kind
  case object S3 extends Kind
  case object Mongo extends Kind

  /** Scheme sniffing, reference `SupportedManagers.extractScheme:46-81`. */
  def kindOf(connect: String): Kind = {
    val c = connect.toLowerCase
    if (c.startsWith("jdbc:")) Jdbc
    else if (c.startsWith("kafka://")) Kafka
    else if (c.startsWith("mongodb://") || c.startsWith("mongodb+srv://")) Mongo
    else if (c.startsWith("s3://") || c.startsWith("s3a://")) S3
    else if (c.startsWith("file:") || c.startsWith("/") || c.startsWith("hdfs:")) File
    else throw new IllegalArgumentException(s"unsupported connect string: $connect")
  }
}

object ReplicaEngine {
  import ConnectorRegistry._

  def read(spark: SparkSession, conf: SourceConf): DataFrame = kindOf(conf.connect) match {
    case Jdbc => JdbcConnector.read(spark, conf)
    case File | S3 => FileConnector.read(spark, conf)
    case Mongo => MongoConnector.read(spark, conf)
    case Kafka => throw new UnsupportedOperationException(
      // parity: the reference's README marks Kafka source unsupported
      // (README.md:188); use Structured Streaming (graft.streaming).
      "Kafka is a sink; for a Kafka source use graft.streaming")
  }

  /** Apply the source-side transform surface: projection
    * (`source-columns`), predicate (`source-where`), arbitrary SQL
    * (`source-query` over a temp view — this is where the full Spark
    * SQL operator surface plugs in for non-JDBC sources; JDBC sources
    * push the query down instead, see JdbcConnector.read). */
  def transform(spark: SparkSession, df: DataFrame, conf: SourceConf): DataFrame = {
    val projected = conf.columns.map(cs => df.select(cs.map(df.col): _*)).getOrElse(df)
    val filtered = conf.where.map(projected.filter).getOrElse(projected)
    conf.query match {
      case Some(q) if kindOf(conf.connect) != Jdbc =>
        // The query's public table name is `t1`, but the catalog
        // registration is a per-invocation unique view bridged in via
        // a CTE — two concurrent replications on one session never
        // collide on shared catalog state. If the user query already
        // opens a WITH clause, splice `t1` in as its first CTE.
        val uniq = s"graft_src_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val trimmed = q.trim
        // A user query that opens its own WITH clause (any casing,
        // any whitespace after the keyword — "WITH\n x AS …" is
        // valid SQL) gets t1 spliced in as the first CTE. A TOP-LEVEL
        // user CTE named t1 would collide with the engine's t1: the
        // anchored check below catches it in first position with a
        // precise message, and any later position becomes a duplicate
        // CTE name that Spark's analyzer rejects (re-thrown with the
        // same message). ANCHORED on purpose — an unanchored scan
        // would false-positive on string literals containing
        // "t1 as (", named windows, and legitimately SHADOWED t1 CTEs
        // inside subquery scopes, all of which are valid queries.
        val collisionMsg =
          "source-query defines its own CTE named t1, which collides " +
            "with the engine-provided t1 source view - rename the CTE"
        if ("(?is)^with\\s+(recursive\\s+)?t1\\s*(\\([^)]*\\))?\\s+as\\s*\\(".r
            .findFirstIn(trimmed).isDefined)
          throw new IllegalArgumentException(collisionMsg)
        val withClause = "(?is)^with\\s+(recursive\\b)?".r
        val sql = withClause.findFirstMatchIn(trimmed) match {
          case Some(m) =>
            val kw = if (m.group(1) != null) "WITH RECURSIVE" else "WITH"
            s"$kw t1 AS (SELECT * FROM $uniq), ${trimmed.substring(m.end).trim}"
          case None => s"WITH t1 AS (SELECT * FROM $uniq) $trimmed"
        }
        // register only after the collision pre-check, and drop on
        // EVERY path (analyzer rethrow included) or failed queries
        // leak catalog entries; analysis resolves the view eagerly,
        // so dropping in finally is safe for the success path too
        filtered.createOrReplaceTempView(uniq)
        try {
          try spark.sql(sql)
          catch {
            // only a duplicate-CTE error naming exactly `t1` is the
            // engine's collision (word-boundary: a user query with
            // its own duplicate t1_stats CTE propagates unchanged)
            case e: org.apache.spark.sql.AnalysisException
                if e.getMessage.toLowerCase.contains("duplicate") &&
                  "(?i)\\bt1\\b".r.findFirstIn(e.getMessage).isDefined =>
              throw new IllegalArgumentException(collisionMsg, e)
          }
        } finally spark.catalog.dropTempView(uniq)
      case _ => filtered
    }
  }

  def write(df: DataFrame, conf: SinkConf): Unit = kindOf(conf.connect) match {
    case Jdbc => JdbcConnector.write(df, conf)
    case Mongo => MongoConnector.write(df, conf)
    case File | S3 =>
      val path = conf.table.map(t => s"${conf.connect}/$t").getOrElse(conf.connect)
      val fmt = FileConnector.format(FileConnector.stripScheme(path),
        conf.fileFormat.orElse(conf.options.get("format")))
      val opts = conf.options - "format" - "singleFile"
      conf.mode match {
        case ReplicationMode.CompleteAtomic =>
          FileConnector.writeAtomic(df, path, fmt, opts)
        case m =>
          FileConnector.write(df, path, fmt, opts,
            overwrite = m != ReplicationMode.Incremental,
            singleFile = conf.options.get("singleFile").exists(_.toBoolean))
      }
    case Kafka =>
      val uri = new java.net.URI(conf.connect)
      KafkaSink.write(df, s"${uri.getHost}:${uri.getPort}",
        conf.table.getOrElse(uri.getPath.stripPrefix("/")),
        conf.options.get("key.column"), conf.options - "key.column")
  }

  /** Full replication: the reference's `processReplica`
    * (`ReplicaDB.java:76-339`). A positive `bandwidthThrottling`
    * (KB/s) rate-limits the source frame before it reaches the sink —
    * the reference throttles inside every manager read loop
    * (`manager/util/BandwidthThrottling.java:30-74`); here it is one
    * `mapPartitions` pacing stage whose global cap is divided across
    * the frame's physical partitions. */
  def replicate(spark: SparkSession, conf: ReplConf): Unit = {
    val df = transform(spark, read(spark, conf.source), conf.source)
    val paced =
      if (conf.bandwidthThrottling > 0)
        graft.operators.Throttle.byBandwidth(df, conf.bandwidthThrottling.toLong)
      else df
    write(paced, conf.sink)
  }
}
