package graft.sources

import java.util.Locale

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** Custom Derby dialect (SURVEY.md §4.3: "custom `JdbcDialect`" is
  * connector-level work, not Catalyst work).
  *
  * Spark's built-in Derby dialect maps StringType→CLOB and
  * BinaryType→BLOB, which makes the writer call
  * `setNull(Types.CLOB/BLOB)` — Derby rejects that against the
  * VARCHAR / VARCHAR FOR BIT DATA columns real sink tables use
  * ("An attempt was made to get a data value of type 'VARCHAR' from
  * 'CLOB'"). VARCHAR null markers are assignable to both VARCHAR and
  * CLOB targets, so the practical mapping is VARCHAR-first.
  *
  * Registered once (first registered dialect wins) when JdbcConnector
  * loads.
  */
object GraftDerbyDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(Locale.ROOT).startsWith("jdbc:derby")

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case StringType => Some(JdbcType("VARCHAR(32672)", java.sql.Types.VARCHAR))
    case BinaryType => Some(JdbcType("VARCHAR(32672) FOR BIT DATA", java.sql.Types.VARBINARY))
    case ByteType | ShortType => Some(JdbcType("SMALLINT", java.sql.Types.SMALLINT))
    case BooleanType => Some(JdbcType("BOOLEAN", java.sql.Types.BOOLEAN))
    case FloatType => Some(JdbcType("REAL", java.sql.Types.REAL))
    case t: DecimalType if t.precision > 31 =>
      // Derby caps precision at 31; shrink scale to preserve magnitude
      val scale = math.max(0, 31 - (t.precision - t.scale))
      Some(JdbcType(s"DECIMAL(31,$scale)", java.sql.Types.DECIMAL))
    case _ => None // common JDBC mappings are fine for the rest
  }

  override def isCascadingTruncateTable(): Option[Boolean] = Some(false)

  private[sources] lazy val ensureRegistered: Unit =
    JdbcDialects.registerDialect(this)
}
