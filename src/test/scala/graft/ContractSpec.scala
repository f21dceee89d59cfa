package graft

/** Guards on the driver contract itself: a typo'd oracle key or an
  * empty flagship query would silently zero part of the round's
  * correctness gate — fail here instead.
  */
class ContractSpec extends SparkTestBase {

  test("every oracle key has a matching query") {
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without queries: $orphaned")
  }

  test("rows-only queries are the documented intentional set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set(
      "dd2_dedup_minhash_lsh", "dd3_dedup_simhash", "dd5_embedding_neardup",
      "k1_kafka_payload",
      "pipe1_training_pipeline", "pf3_approx_stats", "sim3_lsh_topk",
      "qf2_compression_signal", // DEFLATE has no SQL mirror
      "pf5_sketch_union",       // Datasketches HLL is engine-specific
      "emb2_pca_project"),      // driver eigensolve isn't SQL-replayable
      s"unexpected rows-only set: $rowsOnly")
  }

  test("flagship entry returns rows at sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query executes at sf0.001 and returns a non-degenerate schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf())
      assert(df.columns.nonEmpty, s"$name has no columns")
      withClue(s"query $name failed to execute: ") {
        df.limit(1).collect()
      }
    }
  }
}
