package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types._

import graft.core.SourceConf

/** File sources/sinks: CSV with declared JDBC-style column types and
  * dialect presets, plus parquet/orc/json/avro (native readers).
  *
  * Reference: `manager/file/CsvFileManager.java:38-227` (11 dialect
  * presets + format knobs, mandatory `columns.types`),
  * `rowset/CsvCachedRowSetImpl.java:92-157` (type-name -> schema),
  * `manager/file/FileFormats.java:3-15` (format registry).
  *
  * The reference's per-task temp-file write + merge machinery
  * (`manager/LocalFileManager.java`, SURVEY.md §2.2 W9) is replaced
  * wholesale by Spark's committer: per-partition part files with an
  * atomic job commit. Single-file output, when demanded, is
  * `coalesce(1)` — a deliberate serialization point, so it is opt-in.
  */
object FileConnector {

  /** JDBC type-name -> Spark type, the CSV `columns.types` contract
    * (reference `CsvCachedRowSetImpl.java:92-157`). */
  def sqlTypeToSpark(t: String): DataType = t.trim.toUpperCase match {
    case "VARCHAR" | "CHAR" | "LONGVARCHAR" | "NVARCHAR" | "NCHAR" => StringType
    case "TINYINT" => ByteType
    case "SMALLINT" => ShortType
    case "INTEGER" | "INT" => IntegerType
    case "BIGINT" => LongType
    case "NUMERIC" | "DECIMAL" => DecimalType(38, 18)
    case "REAL" | "FLOAT" => FloatType
    case "DOUBLE" | "DOUBLE PRECISION" => DoubleType
    case "BOOLEAN" | "BIT" => BooleanType
    case "DATE" => DateType
    case "TIME" => StringType // no TimeType; ISO string interchange
    // plain SQL TIMESTAMP is zone-naive (the reference round-trips it
    // as a literal string, CsvCachedRowSetImpl.java:139-141) → NTZ;
    // only the WITH TIME ZONE variant carries an instant
    case "TIMESTAMP" => TimestampNTZType
    case "TIMESTAMP WITH TIME ZONE" | "TIMESTAMPTZ" => TimestampType
    case "BINARY" | "VARBINARY" | "LONGVARBINARY" | "BLOB" => BinaryType
    case other => throw new IllegalArgumentException(s"unsupported declared type: $other")
  }

  def declaredSchema(names: Seq[String], types: Seq[String]): StructType = {
    require(names.length == types.length,
      s"columns (${names.length}) and types (${types.length}) length mismatch")
    StructType(names.zip(types).map { case (n, t) =>
      StructField(n, sqlTypeToSpark(t), nullable = true) })
  }

  /** CSV dialect presets (reference `CsvFileManager.java:38-201`),
    * mapped onto Spark CSV reader/writer options. */
  val csvDialects: Map[String, Map[String, String]] = Map(
    "DEFAULT" -> Map("sep" -> ",", "quote" -> "\"", "ignoreLeadingWhiteSpace" -> "false",
      "ignoreTrailingWhiteSpace" -> "false"),
    "EXCEL" -> Map("sep" -> ",", "quote" -> "\""),
    "INFORMIX_UNLOAD" -> Map("sep" -> "|", "quote" -> "\"", "escape" -> "\\"),
    "INFORMIX_UNLOAD_CSV" -> Map("sep" -> ",", "quote" -> "\""),
    "MONGODB_CSV" -> Map("sep" -> ",", "quote" -> "\"", "escape" -> "\""),
    "MONGODB_TSV" -> Map("sep" -> "\t", "quote" -> "\"", "escape" -> "\""),
    "MYSQL" -> Map("sep" -> "\t", "quote" -> "", "escape" -> "\\", "nullValue" -> "\\N"),
    "ORACLE" -> Map("sep" -> ",", "quote" -> "\"", "escape" -> "\\"),
    "POSTGRESQL_CSV" -> Map("sep" -> ",", "quote" -> "\"", "escape" -> "\"", "nullValue" -> ""),
    "POSTGRESQL_TEXT" -> Map("sep" -> "\t", "quote" -> "\"", "escape" -> "\\", "nullValue" -> "\\N"),
    "RFC4180" -> Map("sep" -> ",", "quote" -> "\""),
    "TDF" -> Map("sep" -> "\t", "quote" -> "\"", "ignoreLeadingWhiteSpace" -> "true"))

  /** The avro implementation ships INSIDE spark-sql since Spark 4,
    * but the short-name lookup still demands the external spark-avro
    * module's ServiceLoader registration ("Avro is built-in but
    * external data source module") — resolve the alias to the
    * built-in class directly so `format=avro` works with the stock
    * distribution and no extra jar. */
  val AvroProvider = "org.apache.spark.sql.avro.AvroFileFormat"

  def format(path: String, explicit: Option[String]): String = {
    val named = explicit.getOrElse {
      val p = path.toLowerCase.stripSuffix("/")
      if (p.endsWith(".csv") || p.endsWith(".csv.gz")) "csv"
      else if (p.endsWith(".orc")) "orc"
      else if (p.endsWith(".json") || p.endsWith(".jsonl")) "json"
      else if (p.endsWith(".avro")) "avro"
      else "parquet"
    }
    if (named == "avro") AvroProvider else named
  }

  def read(spark: SparkSession, conf: SourceConf): DataFrame = {
    val path = stripScheme(conf.connect)
    val fmt = format(path, conf.fileFormat.orElse(conf.options.get("format")))
    var reader: DataFrameReader = spark.read.format(fmt)
    val dialectOpts = conf.options.get("dialect")
      .map(d => csvDialects.getOrElse(d.toUpperCase,
        throw new IllegalArgumentException(s"unknown CSV dialect: $d")))
      .getOrElse(Map.empty)
    reader = reader.options(dialectOpts ++ (conf.options - "format" - "dialect"))
    (conf.columnNames, conf.columnTypes) match {
      case (Some(names), Some(types)) =>
        reader = reader.schema(declaredSchema(names, types))
      case (None, Some(_)) =>
        throw new IllegalArgumentException(
          "columns.types requires columns names (source.columns.names)")
      case _ if fmt == "csv" =>
        // reference requires declared types for CSV; we default to
        // header+inference only when explicitly allowed
        if (!conf.options.get("inferSchema").exists(_.toBoolean) &&
            conf.columnNames.isEmpty)
          throw new IllegalArgumentException(
            "CSV source requires declared columns.types (or inferSchema=true)")
      case _ => ()
    }
    reader.load(path)
  }

  def write(df: DataFrame, path: String, fmt: String,
      options: Map[String, String], overwrite: Boolean,
      singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.format(if (fmt == "avro") AvroProvider else fmt)
      .options(options)
      .mode(if (overwrite) "overwrite" else "append")
      .save(stripScheme(path))
  }

  /** Schema-evolution read: one DataFrame over parquet directories
    * written at different schema epochs. `mergeSchema` unions the
    * parquet footers — a column absent from an epoch reads as null
    * there, a column added later appears corpus-wide — so ingestion
    * survives the schema drifting underneath it without a rewrite.
    * Incompatible type changes (int→string) still fail loudly at
    * merge time, which is the correct failure: silent coercion is
    * how a warehouse corrupts. Footer merging is a metadata
    * operation (driver reads footers, optionally parallelized by
    * Spark); row data is untouched until the scan. */
  def readUnified(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "readUnified needs at least one path")
    spark.read.option("mergeSchema", "true")
      .parquet(paths.map(stripScheme): _*)
  }

  /** complete-atomic for file sinks: readers of the sink path always
    * observe a complete table — old or new, never partial, never
    * absent (the reference's staging+swap contract,
    * `SqlManager.java:386-434`, re-expressed for file systems).
    *
    * Local FS: data lives in versioned directories
    * (`<path>__v<stamp>`) and the sink path is a SYMLINK to the
    * current version; the swap is one atomic `rename` of a fresh
    * symlink over the old one, so there is no instant at which the
    * path is missing — directories themselves cannot be swapped
    * atomically on POSIX, links can. (A pre-existing plain directory
    * is migrated to the versioned layout on first atomic write; that
    * one migration has the old rename window.)
    *
    * Non-local FS (HDFS, s3a): no symlinks — falls back to
    * rename-aside (target -> old, staging -> target, drop old), which
    * shrinks the exposure to one metadata rename instead of a full
    * recursive delete, with rollback of the old directory if the
    * second rename fails.
    */
  def writeAtomic(df: DataFrame, path: String, fmt: String,
      options: Map[String, String]): Unit = {
    val target = stripScheme(path)
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    val targetP = new org.apache.hadoop.fs.Path(target)
    val fs = targetP.getFileSystem(hconf)
    val isLocal = fs.getUri.getScheme == "file"
    if (isLocal) writeAtomicLocal(df, target, fmt, options, fs)
    else writeAtomicRenameAside(df, target, fmt, options, fs)
  }

  private def writeAtomicLocal(df: DataFrame, target: String, fmt: String,
      options: Map[String, String], fs: org.apache.hadoop.fs.FileSystem): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val t = Paths.get(target)
    val dataDir = s"${target}__v${System.nanoTime()}"
    df.write.format(fmt).options(options).mode("overwrite").save(dataDir)
    // migrate a pre-versioned plain directory into the symlink layout
    if (Files.exists(t, java.nio.file.LinkOption.NOFOLLOW_LINKS) &&
        !Files.isSymbolicLink(t)) {
      val migrated = Paths.get(s"${target}__v0_migrated")
      Files.move(t, migrated)
      Files.createSymbolicLink(t, migrated)
    }
    val prev =
      if (Files.isSymbolicLink(t)) Some(Files.readSymbolicLink(t)) else None
    val ln = Paths.get(s"${target}__ln${System.nanoTime()}")
    Files.createSymbolicLink(ln, Paths.get(dataDir).toAbsolutePath)
    // rename(2) replaces the existing link in one atomic step: the
    // sink path resolves to the old table right up until it resolves
    // to the new one
    Files.move(ln, t, StandardCopyOption.ATOMIC_MOVE)
    prev.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p.toString), true))
  }

  private def writeAtomicRenameAside(df: DataFrame, target: String, fmt: String,
      options: Map[String, String], fs: org.apache.hadoop.fs.FileSystem): Unit = {
    val staging = target + "__staging"
    val old = target + "__old"
    df.write.format(fmt).options(options).mode("overwrite").save(staging)
    val targetP = new org.apache.hadoop.fs.Path(target)
    val stagingP = new org.apache.hadoop.fs.Path(staging)
    val oldP = new org.apache.hadoop.fs.Path(old)
    if (fs.exists(oldP)) fs.delete(oldP, true) // leftover from a crashed swap
    val hadTarget = fs.exists(targetP)
    if (hadTarget && !fs.rename(targetP, oldP))
      throw new java.io.IOException(s"atomic swap failed: $target -> $old")
    if (!fs.rename(stagingP, targetP)) {
      // roll the old directory back so readers still see a table
      if (hadTarget) fs.rename(oldP, targetP)
      throw new java.io.IOException(s"atomic swap failed: $staging -> $target")
    }
    if (hadTarget) fs.delete(oldP, true)
  }

  def stripScheme(connect: String): String =
    if (connect.startsWith("file://")) connect.stripPrefix("file://") else connect

  /** Schema-drift report between two dataset versions: one row per
    * column that was added, removed, or type-changed (unchanged
    * columns omitted — the report is the delta an alerting pipeline
    * pages on, not a catalog dump). Operates on footer METADATA only:
    * no data is read, so it costs the same at 100 TB as at 100 rows.
    * Pair with [[readUnified]] (null-filling union) for the read-side
    * answer to the same drift. */
  def schemaDriftReport(spark: SparkSession, beforePath: String,
      afterPath: String): DataFrame = {
    val before = spark.read.parquet(beforePath).schema
    val after = spark.read.parquet(afterPath).schema
    val b = before.fields.map(f => f.name -> f.dataType.catalogString).toMap
    val a = after.fields.map(f => f.name -> f.dataType.catalogString).toMap
    val rows =
      (b.keySet -- a.keySet).toSeq.sorted.map(c =>
        (c, "removed", b(c), null: String)) ++
      (a.keySet -- b.keySet).toSeq.sorted.map(c =>
        (c, "added", null: String, a(c))) ++
      (b.keySet & a.keySet).toSeq.sorted.collect {
        case c if b(c) != a(c) => (c, "type_changed", b(c), a(c))
      }
    import spark.implicits._
    rows.toDF("column", "change_type", "type_before", "type_after")
  }

  /** Lenient JSONL ingestion with a corrupt-record AUDIT instead of a
    * crash or a silent drop: PERMISSIVE parse against the declared
    * schema; a line that fails to parse AT ALL quarantines whole
    * (is_corrupt = true, data columns NULL, corrupt_raw = the line),
    * while a syntactically-valid line with a type-mismatched FIELD
    * keeps its parseable fields and still flags is_corrupt with the
    * raw line preserved (Spark PERMISSIVE semantics — the audit
    * column, not column nullness, is the quarantine signal). The
    * ingestion contract a real feed needs — FAILFAST aborts a 100 TB
    * load for one bad line, DROPMALFORMED lies about volume.
    * Row-local parse, shuffle-free. */
  def readJsonAudited(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.col
    val corruptCol = "__corrupt_raw"
    val reserved = Seq(corruptCol, "corrupt_raw", "is_corrupt")
    require(!schema.fieldNames.exists(reserved.contains),
      s"schema must not contain the audit columns ${reserved.mkString(", ")}")
    val withAudit = StructType(schema.fields :+
      StructField(corruptCol, org.apache.spark.sql.types.StringType, true))
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(withAudit)
      .json(path)
      .withColumn("is_corrupt", col(corruptCol).isNotNull)
      .withColumnRenamed(corruptCol, "corrupt_raw")
  }
}
