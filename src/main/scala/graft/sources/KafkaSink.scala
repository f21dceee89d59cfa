package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, StringType, TimestampType}

import graft.functions.Conversions

/** Kafka producer sink: one JSON message per row (reference
  * `manager/KafkaManager.java:49-190`, SURVEY.md §2.2 W8).
  *
  * Semantics preserved:
  *  - date/timestamp columns serialize as ISO-8601 UTC strings
  *    (`KafkaManager.java:129-141`);
  *  - a column literally named `json` passes pre-serialized JSON
  *    through as the value untouched (`KafkaManager.java:97-99`);
  *  - optional key column.
  *
  * The payload builder is separated from the send so it is unit-
  * testable without a broker; `write` is `df.write.format("kafka")`.
  */
object KafkaSink {

  /** Every field in its on-the-wire serialized form: timestamps as
    * ISO-8601 UTC (zone-naive columns are UTC by pipeline convention,
    * so they carry the same `Z` suffix), dates as `yyyy-MM-dd`,
    * everything else native. */
  private def serializedFields(df: DataFrame): Seq[Column] =
    df.schema.fields.toSeq.map { f =>
      f.dataType match {
        case TimestampType => Conversions.toIso8601Utc(col(f.name)).as(f.name)
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          date_format(col(f.name), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as(f.name)
        case DateType => date_format(col(f.name), "yyyy-MM-dd").as(f.name)
        case _ => col(f.name)
      }
    }

  /** Build the (key, value) frame Kafka expects. */
  def payload(df: DataFrame, keyColumn: Option[String]): DataFrame = {
    val value: Column =
      if (df.columns.contains("json")) col("json")
      else to_json(struct(serializedFields(df): _*))
    keyColumn match {
      case Some(k) => df.select(col(k).cast("string").as("key"), value.as("value"))
      case None => df.select(value.as("value"))
    }
  }

  /** The payload with its fields left as TYPED COLUMNS beside the key
    * instead of folded into one JSON string — same key, same field
    * serialization, no JSON formatting. JSON string formatting is
    * engine-specific (field order, float rendering), so this is the
    * oracle-checkable face of the sink: everything except the final
    * `to_json` concatenation. */
  def typedPayload(df: DataFrame, keyColumn: Option[String]): DataFrame = {
    val fields = serializedFields(df)
    keyColumn match {
      case Some(k) => df.select(col(k).cast("string").as("key") +: fields: _*)
      case None => df.select(fields: _*)
    }
  }

  /** Consumer-side parse — the inverse of [[payload]], the direction
    * a downstream pipeline reads the topic: `from_json` against the
    * target schema with temporal fields taken off the wire as
    * STRINGS (their ISO-8601/date serialized form) and cast back, so
    * payload → parse is LOSSLESS for every type the sink serializes
    * (doubles survive via to_json's shortest-round-trip rendering;
    * sub-millisecond timestamp precision is the documented wire
    * truncation — the serializer emits milliseconds). Row-local
    * codegen projection, shuffle-free. */
  def parse(df: DataFrame,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val wireSchema = org.apache.spark.sql.types.StructType(
      schema.fields.map { f =>
        f.dataType match {
          case TimestampType | _: org.apache.spark.sql.types.TimestampNTZType |
               DateType => f.copy(dataType = StringType)
          case _ => f
        }
      })
    val parsed = df.select(from_json(col("value"), wireSchema).as("__r"))
      .select(col("__r.*"))
    schema.fields.foldLeft(parsed) { (acc, f) =>
      f.dataType match {
        // offset-aware pattern: the serializer emits via
        // toIso8601Utc's "...SSSXXX", which renders 'Z' only in a UTC
        // session — a literal-'Z' pattern would NULL every timestamp
        // under any other session timezone (offsets like '+02:00')
        case TimestampType => acc.withColumn(f.name,
          to_timestamp(col(f.name), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"))
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          acc.withColumn(f.name,
            to_timestamp(col(f.name), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
              .cast("timestamp_ntz"))
        case DateType => acc.withColumn(f.name, to_date(col(f.name)))
        case _ => acc
      }
    }
  }

  def write(df: DataFrame, bootstrapServers: String, topic: String,
      keyColumn: Option[String] = None,
      options: Map[String, String] = Map.empty): Unit =
    payload(df, keyColumn).write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .options(options)
      .save()
}
