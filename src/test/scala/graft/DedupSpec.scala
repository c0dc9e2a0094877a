package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends TestSpark {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),     // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"),     // near dup of 1
    (4L, "completely different words about spark engines"),
    (5L, "spark engines words different completely about"),  // same token set as 4
    (6L, "unrelated text mentioning nothing similar at all")
  ).toDF("id", "text")

  test("exact dedup keeps one deterministic representative per key") {
    val out = Dedup.exact(docs, md5(col("text")), col("id"))
    assert(out.count() === 5)
    // dup group {1,2} keeps min id = 1
    assert(out.filter(col("id").isin(1L, 2L)).select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("ngram jaccard finds exact and token-set duplicates") {
    val pairs = Dedup.ngramJaccardPairs(docs, col("id"), col("text"), 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))  // identical
    assert(pairs.contains((4L, 5L)))  // same set, different order
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("minhash-LSH candidates match brute-force jaccard pairs at high threshold") {
    val brute = Dedup.ngramJaccardPairs(docs, col("id"), col("text"), 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, col("id"), col("text"),
        bands = 16, rowsPerBand = 4, minJaccard = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // LSH verifies candidates exactly, so lsh ⊆ brute always; with 16
    // bands of 4 rows, P(miss | J>=0.7) < 1% → equality on this fixture.
    assert(lsh === brute)
    assert(lsh.contains((1L, 2L)))
  }

  test("simhash: identical docs collide at distance 0, near-dups nearby") {
    val fps = docs.select(col("id"), Dedup.simhash(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) === fps(2L))
    assert(fps(4L) === fps(5L)) // simhash is token-set based
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(1L), fps(3L)) <= 16)       // one word changed
    assert(ham(fps(1L), fps(6L)) > 16)        // unrelated
    val pairs = Dedup.simhashPairs(docs, col("id"), col("text"), maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((4L, 5L)))
  }

  test("minhash-LSH agrees with brute force on the real documents table") {
    val real = Tables(spark, sfDir, "documents")
    val brute = Dedup.ngramJaccardPairs(real, col("doc_id"), col("text"), 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(real, col("doc_id"), col("text"),
        bands = 16, rowsPerBand = 4, minJaccard = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute))
    // banding catches >= 90% of J>=0.8 pairs in expectation
    assert(brute.isEmpty || lsh.size.toDouble / brute.size >= 0.8)
  }
}
