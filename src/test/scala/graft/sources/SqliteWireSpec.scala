package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** W5 (SQLite sink) emitted-SQL verification against a REAL SQLite
  * engine — the sandbox ships a `sqlite3` CLI (no JDBC driver jar, so
  * the transport stays spec-only, same split as [[PgWireSpec]]): the
  * dialect's exact statement strings run in the engine's exact
  * incremental-mode order against a real database file.
  *
  * This suite is what CAUGHT a real defect: SQLite's parser rejects
  * upsert-from-SELECT without a WHERE clause (the documented ON
  * CONFLICT / join ambiguity), which the unified Postgres|Sqlite
  * merge branch missed — the reference emits `WHERE true`
  * (`SqliteManager.java:252-254`) and now so do we, for SQLite only.
  * Cancels where no sqlite3 binary exists.
  */
class SqliteWireSpec extends SparkTestBase {

  private def sqlite3: Option[String] =
    Seq("/root/miniconda/bin/sqlite3", "/usr/bin/sqlite3",
      "/usr/local/bin/sqlite3")
      .find(p => Files.isExecutable(Paths.get(p)))

  private def run(db: String, sql: String): (Int, String) = {
    val pb = new ProcessBuilder(sqlite3.get, db, sql)
    pb.redirectErrorStream(true)
    val p = pb.start()
    p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    (p.waitFor(), out)
  }

  test("W5: staging DDL + upsert merge + DELETE-as-truncate run the " +
      "engine's exact SQL against a real SQLite") {
    assume(sqlite3.isDefined, "sqlite3 binary not present")
    import DialectMerge.{Sqlite => Sq}
    val db = Files.createTempDirectory("graft_sqlite").toString + "/w5.db"
    def exec(sql: String): String = {
      val (rc, out) = run(db, sql)
      assert(rc == 0, s"sqlite3 failed on: $sql\n$out")
      out
    }
    exec("CREATE TABLE msink (id INTEGER PRIMARY KEY, v TEXT, n INT)")
    exec("INSERT INTO msink VALUES (1,'old1',10),(2,'old2',20)")

    // 1. staging DDL (CREATE TABLE AS ... WHERE 1 = 0)
    val staging = DialectMerge.stagingName("msink", seed = 4242)
    exec(DialectMerge.createStagingSql(staging, "msink", Sq))
    assert(exec(s"SELECT count(*) FROM $staging").trim == "0")

    // 2. batch lands in staging (SQLite has no bulk wire; the engine
    //    uses the generic batched-insert path)
    exec(s"INSERT INTO $staging VALUES (2,'new2',200),(3,'new3',300)")

    // 3. the dialect merge: upsert-from-SELECT with the WHERE true
    //    guard the real parser requires
    exec(DialectMerge.mergeSql("msink", staging,
      Seq("id", "v", "n"), Seq("id"), Sq))
    assert(exec("SELECT id, v, n FROM msink ORDER BY id").trim
      .split("\n").toSeq == Seq("1|old1|10", "2|new2|200", "3|new3|300"))

    // 4. degenerate all-keys merge: DO NOTHING form parses too
    exec(DialectMerge.mergeSql("msink", staging,
      Seq("id"), Seq("id"), Sq))

    // 5. drop staging; DELETE-as-truncate (SQLite has no TRUNCATE)
    exec(s"DROP TABLE $staging")
    exec(DialectMerge.truncateSql("msink", Sq))
    assert(exec("SELECT count(*) FROM msink").trim == "0")

    // quoted-identifier (mixed-case) form parses and merges
    exec("CREATE TABLE qsink (\"Id\" INTEGER PRIMARY KEY, \"Val\" TEXT)")
    exec("CREATE TABLE qstg (\"Id\" INTEGER, \"Val\" TEXT)")
    exec("INSERT INTO qstg VALUES (7, 'x')")
    exec(DialectMerge.mergeSql("qsink", "qstg", Seq("Id", "Val"), Seq("Id"), Sq))
    assert(exec("SELECT count(*) FROM qsink").trim == "1")
  }

  test("S6: partition predicates slice a real SQLite table disjointly") {
    assume(sqlite3.isDefined, "sqlite3 binary not present")
    val db = Files.createTempDirectory("graft_sqlite").toString + "/s6.db"
    def exec(sql: String): String = {
      val (rc, out) = run(db, sql)
      assert(rc == 0, s"sqlite3 failed on: $sql\n$out")
      out
    }
    exec("CREATE TABLE t (k INTEGER)")
    exec("INSERT INTO t VALUES " +
      (1 to 97).map(i => s"(${i * 7 % 101})").mkString(","))
    // every generated predicate must parse, and the slices must
    // partition the table exactly (disjoint + complete)
    for (preds <- Seq(JdbcPartitioning.modKey("k", 4),
        JdbcPartitioning.keyRange("k", 0, 100, 4))) {
      val counts = preds.map(p =>
        exec(s"SELECT count(*) FROM t WHERE $p").trim.toLong)
      assert(counts.sum == 97, s"slices lose/duplicate rows: $counts")
    }
  }
}
