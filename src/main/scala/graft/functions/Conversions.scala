package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar conversion surface of the reference, re-expressed as Spark
  * `Column` functions (all codegen'd built-ins, no UDFs).
  *
  * Reference: `time/Conversions.java:17-91` (epoch-day / epoch-milli /
  * micro / nano to timestamps, time-of-day helpers),
  * `manager/KafkaManager.java:76-81,129-141` (ISO-8601 UTC date
  * serialization), `manager/PostgresqlManager.java:363-393` (bytes to
  * hex literal), `manager/PostgresqlManager.java:133-137` +
  * `manager/MySQLManager.java:122-129` (control-char escaping for
  * bulk-load text protocols).
  */
object Conversions {

  /** Epoch day number -> DateType. Reference `Conversions.java:17-24`. */
  def epochDayToDate(c: Column): Column = date_add(lit("1970-01-01").cast("date"), c.cast("int"))

  /** DateType -> epoch day number. */
  def dateToEpochDay(c: Column): Column = datediff(c, lit("1970-01-01").cast("date"))

  /** Epoch milliseconds -> TimestampType (UTC). Reference `Conversions.java:31-38`. */
  def epochMillisToTimestamp(c: Column): Column = timestamp_millis(c)

  /** Epoch microseconds -> TimestampType. Reference `Conversions.java:45-52`. */
  def epochMicrosToTimestamp(c: Column): Column = timestamp_micros(c)

  /** Epoch nanoseconds -> TimestampType (truncates to micros, Spark's
    * finest granularity). Reference `Conversions.java:59-66`. */
  def epochNanosToTimestamp(c: Column): Column = timestamp_micros((c / 1000L).cast("long"))

  /** TimestampType -> epoch milliseconds. */
  def timestampToEpochMillis(c: Column): Column = unix_millis(c)

  /** TimestampType -> epoch microseconds. */
  def timestampToEpochMicros(c: Column): Column = unix_micros(c)

  /** Micro-of-day -> "HH:mm:ss.SSSSSS" local-time string.
    * Reference `Conversions.java:73-91` returns `LocalTime`; Spark has
    * no TimeType so the engine's interchange form is the ISO string. */
  def microOfDayToTimeString(c: Column): Column =
    date_format(timestamp_micros(c), "HH:mm:ss.SSSSSS")

  /** Kafka-sink date serialization: ISO-8601 instant in UTC with
    * millisecond precision, e.g. `2024-01-01T00:09:58.778Z`.
    * Reference `KafkaManager.java:129-141`. */
  def toIso8601Utc(c: Column): Column =
    date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")

  /** Bytes -> Postgres hex literal `\xDEADBEEF`.
    * Reference `PostgresqlManager.java:363-393`. */
  def toPgHexLiteral(c: Column): Column = concat(lit("\\x"), lower(hex(c)))

  /** Bytes -> MySQL UNHEX-ready uppercase hex.
    * Reference `MySQLManager.java:369-391`. */
  def toMysqlHex(c: Column): Column = upper(hex(c))

  /** Escape `\`, newline, carriage return for COPY/LOAD-DATA text
    * protocols; NULL -> `\N` handled by the writer's nullValue option.
    * Reference `PostgresqlManager.java:133-137`. */
  def escapeBulkText(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, "\\\\", "\\\\\\\\"),
        "\n", "\\\\n"),
      "\r", "\\\\r")

  /** Boolean string coercion ("1|yes|on|t|y|true" -> true, else false),
    * the CSV reader's lenient rule. Reference
    * `rowset/CsvCachedRowSetImpl.java:323-330`. */
  def lenientBoolean(c: Column): Column =
    lower(trim(c)).isin("1", "yes", "on", "t", "y", "true")
}
