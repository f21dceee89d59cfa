package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Protocol-level tests for the vendor bulk-load writers: no Postgres
  * or MySQL server exists in this environment, so the emitted wire
  * text and SQL command strings ARE the testable contract
  * (reference `PostgresqlManager.java:133-137`, `:363-393`,
  * `MySQLManager.java:176-215`). */
class BulkLoadSpec extends AnyFunSuite {
  import BulkLoad._

  private val US = 0x1f.toChar

  test("field escaping covers backslash, newline, CR, NUL and the delimiter") {
    assert(escapeField("a\\b") == "a\\\\b")
    assert(escapeField("a\nb\rc") == "a\\nb\\rc")
    assert(escapeField("a\u0000b") == "a\\0b")
    // the reference leaves a raw 0x1F in data unescaped, which would
    // shift every following column; here it is escaped
    assert(escapeField(s"a${US}b") == s"a\\${US}b")
    assert(escapeField("a\nb", disableEscape = true) == "a\nb")
  }

  test("binary renders as uppercase hex; postgres form carries the bytea wire prefix") {
    val bytes = Array[Byte](0x00, 0x0f, 0x10, 0xff.toByte)
    assert(bytesToHex(bytes) == "000F10FF")
    assert(bytesToPostgresHex(bytes) == "\\\\x000F10FF")
  }

  test("row encoding: unit-separated fields, \\N nulls, typed text forms") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("ok", BooleanType), StructField("data", BinaryType)))
    val row = Row(7L, "a\nb", true, Array[Byte](0x01, 0xab.toByte))
    assert(encodeRow(row, schema, bytesToHex) == s"7${US}a\\nb${US}true${US}01AB")
    assert(encodeRow(row, schema, bytesToPostgresHex) ==
      s"7${US}a\\nb${US}true${US}\\\\x01AB")
    val nulls = Row(null, null, null, null)
    assert(encodeRow(nulls, schema, bytesToHex) == s"\\N$US\\N$US\\N$US\\N")
  }

  test("MySQL wire renders booleans as 1/0; Postgres keeps true/false") {
    // MySQL coerces the text 'true' into TINYINT(1)/BIT as 0 (silent
    // corruption, or an error in strict mode): the LOAD DATA encoder
    // must emit 1/0, matching what MySQL's own ResultSet.getString
    // produces. Postgres COPY accepts true/false.
    val schema = StructType(Seq(
      StructField("ok", BooleanType), StructField("no", BooleanType)))
    val row = Row(true, false)
    assert(encodeRow(row, schema, bytesToHex, boolAsInt = true) == s"1${US}0")
    assert(encodeRow(row, schema, bytesToPostgresHex) == s"true${US}false")
    assert(encodeRow(Row(null, null), schema, bytesToHex, boolAsInt = true) ==
      s"\\N$US\\N")
  }

  test("connection properties carry the engine's option map (credentials)") {
    val p = connProps(Map("user" -> "u", "password" -> "secret",
      "loginTimeout" -> "10"))
    assert(p.getProperty("user") == "u")
    assert(p.getProperty("password") == "secret")
    assert(p.getProperty("loginTimeout") == "10")
    assert(connProps(Map.empty).isEmpty)
  }

  test("COPY command matches the reference meta-command") {
    assert(pgCopyCommand("sink", Seq("a", "b")) ==
      "COPY sink (a, b) FROM STDIN WITH DELIMITER e'\\x1f' ENCODING 'UTF-8' ")
    assert(pgCopyCommand("sink", Nil) ==
      "COPY sink FROM STDIN WITH DELIMITER e'\\x1f' ENCODING 'UTF-8' ")
  }

  test("LOAD DATA stages binary columns through @vars decoded with UNHEX") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("img", BinaryType),
      StructField("name", StringType)))
    val sql = mysqlLoadDataCommand("sink", schema)
    assert(sql.startsWith("LOAD DATA LOCAL INFILE 'dummy' INTO TABLE sink"))
    assert(sql.contains("FIELDS TERMINATED BY X'1F'"))
    assert(sql.contains("(id, @img, name)"))
    assert(sql.endsWith(" SET img = UNHEX(@img)"))
    // no binary columns: no @vars, no SET clause
    val plain = mysqlLoadDataCommand("sink",
      StructType(Seq(StructField("id", LongType))))
    assert(plain.endsWith("(id)"))
    assert(!plain.contains("UNHEX"))
  }

  test("url routing picks the vendor path; derby and oracle have none") {
    assert(pathForUrl("jdbc:postgresql://h/db").contains(PgCopy))
    assert(pathForUrl("jdbc:mysql://h/db").contains(MySqlLoadData))
    assert(pathForUrl("jdbc:mariadb://h/db").contains(MySqlLoadData))
    assert(pathForUrl("jdbc:sqlserver://h;db").contains(SqlServerBulk))
    assert(pathForUrl("jdbc:derby:memory:x").isEmpty)
    assert(pathForUrl("jdbc:oracle:thin:@h").isEmpty)
  }

  test("fast path does not activate without the vendor driver on the classpath") {
    // this container has no vendor driver jars: the connector must
    // fall back to the generic batched-insert writer (Derby e2e specs
    // exercise that path)
    assert(!available("jdbc:postgresql://h/db"))
    assert(!available("jdbc:mysql://h/db"))
    assert(!available("jdbc:sqlserver://h;db"))
    assert(!available("jdbc:derby:memory:x"))
  }

  test("escaping is lossless: an unescape inverse recovers arbitrary strings") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // the COPY/LOAD DATA text decoder the server implements; flags
    // any control byte reaching it OUTSIDE an escape sequence (those
    // would break row/field framing on the wire; an ESCAPED delimiter
    // is backslash + the raw byte and is legal)
    def unescape(s: String): (String, Boolean) = {
      val b = new StringBuilder
      var bare = false
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case '\\' => b += '\\'
            case 'n' => b += '\n'
            case 'r' => b += '\r'
            case '0' => b += '\u0000'
            case e => b += e // escaped delimiter and friends
          }
          i += 2
        } else {
          if (c == '\n' || c == '\r' || c == US || c == '\u0000') bare = true
          b += c; i += 1
        }
      }
      (b.toString, bare)
    }
    val tricky = Gen.listOf(Gen.frequency(
      8 -> Gen.asciiPrintableChar,
      1 -> Gen.oneOf('\\', '\n', '\r', '\u0000', US),
      1 -> Gen.choose(0x20.toChar, 0x2fff.toChar))).map(_.mkString)
    val prop = Prop.forAll(tricky) { s =>
      val (decoded, bareControl) = unescape(escapeField(s))
      !bareControl && decoded == s
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("BulkCopy record feed declares SQL Server column metadata and walks rows") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("price", DecimalType(10, 2)), StructField("img", BinaryType)))
    val rows = Iterator(
      Row(1L, "a", null, Array[Byte](1)),
      Row(2L, null, null, null))
    val st = new BulkRecordState(schema, rows)
    // ordinals are 1-based and ordered
    assert(st.ordinals.toArray.toSeq == Seq(1, 2, 3, 4))
    assert(st.columnName(1) == "id" && st.columnName(4) == "img")
    assert(st.columnType(1) == java.sql.Types.BIGINT)
    assert(st.columnType(2) == java.sql.Types.NVARCHAR)
    assert(st.columnType(3) == java.sql.Types.DECIMAL)
    assert(st.precision(3) == 10 && st.scale(3) == 2)
    assert(st.columnType(4) == java.sql.Types.VARBINARY)
    // cursor protocol: next() then getRowData(), nulls preserved
    assert(st.next())
    assert(st.rowData()(0) == java.lang.Long.valueOf(1L))
    assert(st.rowData()(2) == null)
    assert(st.next())
    assert(st.rowData()(1) == null)
    assert(!st.next())
  }
}
