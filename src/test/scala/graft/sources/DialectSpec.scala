package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class DialectMergeSpec extends AnyFunSuite {
  import DialectMerge._
  val cols = Seq("id", "name", "price")
  val keys = Seq("id")

  test("postgres upsert uses ON CONFLICT DO UPDATE with excluded") {
    val sql = mergeSql("sink", "stg", cols, keys, Postgres)
    assert(sql.contains("ON CONFLICT (\"id\") DO UPDATE SET"))
    assert(sql.contains("\"name\" = excluded.\"name\""))
    assert(!sql.contains("\"id\" = excluded"))
  }

  test("mysql upsert uses ON DUPLICATE KEY UPDATE with VALUES()") {
    val sql = mergeSql("sink", "stg", cols, keys, MySql)
    assert(sql.contains("ON DUPLICATE KEY UPDATE"))
    assert(sql.contains("`name` = VALUES(`name`)"))
    assert(sql.contains("`id`, `name`, `price`"))
  }

  test("oracle merge carries PARALLEL hint and matched/not-matched branches") {
    val sql = mergeSql("sink", "stg", cols, keys, Oracle)
    assert(sql.startsWith("MERGE /*+ PARALLEL */ INTO sink t USING stg s"))
    assert(sql.contains("WHEN MATCHED THEN UPDATE SET"))
    assert(sql.contains("WHEN NOT MATCHED THEN INSERT"))
  }

  test("sqlserver merge is terminated with a semicolon") {
    assert(mergeSql("sink", "stg", cols, keys, SqlServer).endsWith(";"))
  }

  test("all-key degenerate case drops the update branch") {
    val sql = mergeSql("sink", "stg", Seq("id"), Seq("id"), SqlServer)
    assert(!sql.contains("WHEN MATCHED"))
    val pg = mergeSql("sink", "stg", Seq("id"), Seq("id"), Postgres)
    assert(pg.contains("DO NOTHING"))
  }

  test("truncate degrades to DELETE where TRUNCATE is unsupported") {
    assert(truncateSql("t", Sqlite) == "DELETE FROM t")
    assert(truncateSql("t", Postgres) == "TRUNCATE TABLE t")
  }

  test("staging DDL per dialect clones structure without rows") {
    assert(createStagingSql("stg", "sink", Postgres).contains("UNLOGGED"))
    assert(createStagingSql("stg", "sink", Oracle).contains("rownum = -1"))
    assert(createStagingSql("stg", "sink", SqlServer).contains("WHERE 0 = 1"))
    assert(createStagingSql("stg", "sink", DerbyAnsi).contains("WITH NO DATA"))
  }

  test("dialect sniffing from JDBC url") {
    assert(fromUrl("jdbc:postgresql://h/db") == Postgres)
    assert(fromUrl("jdbc:mariadb://h/db") == MySql)
    assert(fromUrl("jdbc:oracle:thin:@h") == Oracle)
    assert(fromUrl("jdbc:derby:memory:x") == DerbyAnsi)
  }
}

class JdbcPartitioningSpec extends AnyFunSuite {
  import JdbcPartitioning._

  test("ora_hash predicates cover N disjoint slices") {
    val p = oraHash(4)
    assert(p.size == 4)
    assert(p.head == "ora_hash(rowid, 3) = 0")
    assert(p.last == "ora_hash(rowid, 3) = 3")
  }

  test("physloc predicates use checksum modulo") {
    assert(physloc(2) == Seq(
      "ABS(CHECKSUM(%%physloc%%)) % 2 = 0", "ABS(CHECKSUM(%%physloc%%)) % 2 = 1"))
  }

  test("single partition degenerates to tautology") {
    assert(oraHash(1) == Seq("1 = 1"))
    assert(modKey("k", 1) == Seq("1 = 1"))
  }

  test("key ranges are contiguous, closed at the top, null-safe at slice 0") {
    val p = keyRange("k", 0, 99, 4)
    assert(p.head.contains("k IS NULL"))
    assert(p.last == "k >= 75")
    assert(p(1) == "k >= 25 AND k < 50")
  }

  test("offset chunks leave the last chunk open-ended") {
    val c = offsetChunks(10, 3)
    assert(c == Seq((0L, Some(4L)), (4L, Some(4L)), (8L, None)))
  }

  test("url dispatch picks the dialect strategy") {
    assert(forUrl("jdbc:oracle:thin:@h", 2, None).head.startsWith("ora_hash"))
    assert(forUrl("jdbc:sqlserver://h", 2, None).head.contains("physloc"))
    assert(forUrl("jdbc:postgresql://h/db", 2, Some("id")) == modKey("id", 2))
    assert(forUrl("jdbc:postgresql://h/db", 2, Some("id"), Some((0L, 9L))) ==
      keyRange("id", 0, 9, 2))
    assert(forUrl("jdbc:postgresql://h/db", 4, None) == Seq("1 = 1"))
  }
}
