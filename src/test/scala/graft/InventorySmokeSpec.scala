package graft

/** Every SparkEntry query must at least run and produce a sane result
  * at sf0.001 — the full value-level check is the driver's DuckDB gate
  * (mirrored locally by tools/check_local.py). */
class InventorySmokeSpec extends TestSpark {

  private val mayBeEmpty =
    Set("d02_ngram_jaccard", "d03_minhash_lsh", "d04_simhash",
        "d06_dedup_clusters", // clusters exist only if near-dup pairs do
        "q31_except") // at sf0.001 every AUTOMOBILE customer has a >300k order

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sfDir).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
