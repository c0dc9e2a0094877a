package graft

import org.apache.spark.sql.functions._
import graft.operators.Vocab

/** Corpus-trained vocabulary scoring (operators/Vocab.scala):
  * deterministic top-K training, row-local OOV and bigram-surprise
  * apply, integer-exactness of the log2 bucketing.
  */
class VocabSpec extends TestSpark {
  import spark.implicits._

  // "the cat" x4, "the dog" x2, "a cat" x1, one junk doc: frequencies
  // the=6, cat=5, dog=2, a=1, zzz=1, plus bigram structure
  private def corpus = Seq(
    (1L, "the cat sat"), (2L, "the cat sat"), (3L, "the cat ran"),
    (4L, "the cat ran"), (5L, "the dog sat"), (6L, "the dog ran"),
    (7L, "a cat zzz"), (8L, ""), (9L, "  ")
  ).toDF("doc_id", "text")

  test("topTokens is deterministic: count desc, token asc ties") {
    val top3 = Vocab.topTokens(corpus, col("text"), 3)
    // the=7? no: the appears in docs 1-6 → 6; cat=5; sat=3, ran=3 tie →
    // 'ran' < 'sat' bytewise
    assert(top3 == Seq("the", "cat", "ran"))
  }

  test("oovRate counts non-vocab tokens; blank docs score zero") {
    val byId = Vocab.oovRate(corpus, col("doc_id"), col("text"), k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // vocab = {the, cat, ran}; doc 1 "the cat sat": 3 tokens, 1 oov
    assert(byId(1L) == ((3L, 1L, 333L)))
    // doc 6 "the dog ran": dog oov
    assert(byId(6L) == ((3L, 1L, 333L)))
    // doc 7 "a cat zzz": a, zzz oov
    assert(byId(7L) == ((3L, 2L, 666L)))
    // blank docs: 0 tokens, 0 oov, milli uses greatest(n_tok,1)
    assert(byId(8L) == ((0L, 0L, 0L)))
    assert(byId(9L) == ((0L, 0L, 0L)))
  }

  test("bigramSurprise: bits are exact integer log2 buckets") {
    val out = Vocab.bigramSurprise(corpus, col("doc_id"), col("text"), k = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // Model (full, k=64 covers all): uni: the=6 cat=5 sat=3 ran=3 dog=2
    // a=1 zzz=1; big: "the cat"=4 "cat sat"=2 "cat ran"=2 "the dog"=2
    // "dog sat"=1 "dog ran"=1 "a cat"=1 "cat zzz"=1.
    // doc 1 "the cat sat": (the,cat): 6 div 4 = 1 → 0 bits;
    //                      (cat,sat): 5 div 2 = 2 → 1 bit. total 1
    assert(out(1L) == ((2L, 1L, 500L)))
    // doc 7 "a cat zzz": (a,cat): 1 div 1 = 1 → 0; (cat,zzz): 5 div 1 =
    // 5 → 2 bits. total 2, milli = 2000/2 = 1000
    assert(out(7L) == ((2L, 2L, 1000L)))
    // blank: no bigrams
    assert(out(8L) == ((0L, 0L, 0L)))
  }

  test("pruned bigram table penalizes rare continuations (count-1 fallback)") {
    // k=1 keeps only "the cat"=4; every other pair falls back to c=1
    val out = Vocab.bigramSurprise(corpus, col("doc_id"), col("text"), k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc 1: (the,cat): 6 div 4 = 1 → 0 bits; (cat,sat): 5 div 1 = 5 →
    // 2 bits (was 1 with the full table)
    assert(out(1L) == 2L)
  }

  test("unigram cap bounds the driver model where the vocabulary is not: " +
       "kUni entries max, absent prefixes fall back to count 1") {
    // vocabulary has 7 distinct tokens; kUni=2 keeps only {the=6, cat=5}
    val uni = Vocab.unigramCounts(corpus, col("text"), k = 2)
    assert(uni == Seq("the" -> 6L, "cat" -> 5L))
    assert(Vocab.unigramCounts(corpus, col("text"), k = 3).size == 3)
    val out = Vocab.bigramSurprise(corpus, col("doc_id"), col("text"),
        k = 64, kUni = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc 1 "the cat sat": (the,cat): 6 div 4 = 1 → 0 bits;
    // (cat,sat): 5 div 2 = 2 → 1 bit — both prefixes in-table, total 1
    assert(out(1L) == 1L)
    // doc 7 "a cat zzz": (a,cat): 'a' capped out → 1 div 1 → 0 bits;
    // (cat,zzz): 5 div 1 = 5 → 2 bits. total 2 (same as full-table run:
    // a rare prefix's fallback ratio collapses to ~1, never explodes)
    assert(out(7L) == 2L)
  }

  test("scores are content-keyed: invariant under partitioning") {
    val a = Vocab.bigramSurprise(corpus, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val b = Vocab.bigramSurprise(corpus.repartition(7), col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(a == b)
  }

  // target = docs 1-4 ("the cat ..."): 8 target bigrams, 18 raw.
  // a doc full of target-frequent pairs must outscore one whose pairs
  // only the raw corpus knows.
  private def dsirCorpus = Seq(
    (1L, "the cat sat", 1), (2L, "the cat sat", 1),
    (3L, "the cat ran", 1), (4L, "the cat ran", 1),
    (5L, "the dog sat", 0), (6L, "the dog sat", 0),
    (7L, "the dog ran", 0), (8L, "the dog ran", 0),
    (9L, "the cat sat", 0), (10L, "the dog sat", 0),
    (11L, "", 0)
  ).toDF("doc_id", "text", "is_tgt")

  test("dsirScore upweights target-like docs, exact integer bits") {
    val out = Vocab.dsirScore(dsirCorpus, col("doc_id"), col("text"),
        targetFilter = col("is_tgt") === 1, k = 64)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // raw model: N=20 pairs; c(the cat)=5, c(cat sat)=3, c(the dog)=5,
    // c(dog sat)=4 ... target model: N=8; c(the cat)=4, c(cat sat)=2,
    // c(cat ran)=2, c(dog *)=absent → cost floor(log2(8))=3 bits each.
    // doc 1 "the cat sat": raw = fl(20/5)+fl(20/3) = 2+2 = 4;
    // tgt = fl(8/4)+fl(8/2) = 1+2 = 3 → score 1
    assert(out(1L) == ((2L, 4L, 3L, 1L)))
    // doc 5 "the dog sat": raw = fl(20/5)+fl(20/4) = 2+2 = 4;
    // tgt = fl(8/1)+fl(8/1) = 3+3 = 6 → score -2 (negative stays exact)
    assert(out(5L) == ((2L, 4L, 6L, -2L)))
    // target-like beats target-unlike
    assert(out(1L)._4 > out(5L)._4)
    // blank doc: zero pairs, zero bits
    assert(out(11L) == ((0L, 0L, 0L, 0L)))
  }
}
