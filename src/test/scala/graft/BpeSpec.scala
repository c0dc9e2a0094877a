package graft

import org.apache.spark.sql.functions._
import graft.functions.BpeFunctions
import graft.operators.Bpe

class BpeSpec extends TestSpark {
  import spark.implicits._

  private def ranksOf(merges: Seq[(String, String)]) = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((l, r), i) => m.put(s"$l $r", i) }
    m
  }

  test("train reproduces the classic Sennrich example, deterministically") {
    // vocab from the BPE paper's running example; counts chosen so the
    // merge order is fully forced (max count, then lexicographic pair)
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val got = Bpe.train(words, 6)
    // hand-derived: es/st tie at 9 → 'e s' wins lexicographically;
    // then 'es t' 9; lo/ow tie at 7 → 'l o'; 'lo w' 7; 6-tier ties
    // resolve 'e w' then 'ew est'
    assert(got === Seq(("e", "s"), ("es", "t"), ("l", "o"),
      ("lo", "w"), ("e", "w"), ("ew", "est")))
    // deterministic under input order
    assert(Bpe.train(words.reverse, 6) === got)
    // trainer stops when no pair repeats rather than padding
    assert(Bpe.train(Seq(("ab", 1L)), 8) === Nil)
  }

  test("encodeWord applies lowest-rank-first fixed-point merging") {
    val ranks = ranksOf(Seq(("e", "s"), ("es", "t"), ("l", "o"),
      ("lo", "w"), ("e", "w"), ("ew", "est")))
    assert(Bpe.encodeWord("lowest", ranks).toSeq === Seq("low", "est"))
    assert(Bpe.encodeWord("newest", ranks).toSeq === Seq("n", "ewest"))
    assert(Bpe.encodeWord("low", ranks).toSeq === Seq("low"))
    assert(Bpe.encodeWord("z", ranks).toSeq === Seq("z"))
    assert(Bpe.encodeWord("sets", ranks).toSeq === Seq("s", "e", "t", "s"))
  }

  test("encodeWord: merge-all passes reach the recursive fixed point " +
       "(repeated pairs, then pairs of merged tokens)") {
    val ranks = ranksOf(Seq(("a", "a"), ("aa", "aa")))
    // one merge-all pass gives aa|aa, the next round merges the merged
    assert(Bpe.encodeWord("aaaa", ranks).toSeq === Seq("aaaa"))
    // odd tail: left-to-right non-overlapping
    assert(Bpe.encodeWord("aaaaa", ranks).toSeq === Seq("aaaa", "a"))
    assert(Bpe.encodeWord("baaab", ranks).toSeq === Seq("b", "aa", "a", "b"))
  }

  test("bpe_encode expression == driver-side reference over mixed text") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"),
      ("lo", "w"), ("e", "w"), ("ew", "est"))
    val ranks = ranksOf(merges)
    val texts = Seq(
      "The LOWEST of the newest!", "lowest, lowest; lowest",
      "", "1234 --- !!!", "widest gap", "x")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select(col("id"),
        BpeFunctions.bpeEncode(col("text"), merges).as("toks"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    val wordRe = java.util.regex.Pattern.compile(Bpe.WordPattern)
    val want = texts.zipWithIndex.map { case (t, i) =>
      val m = wordRe.matcher(t.toLowerCase)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) buf ++= Bpe.encodeWord(m.group(), ranks)
      (i.toLong, buf.toSeq)
    }.sortBy(_._1)
    assert(got.map(x => (x._1, x._2.toList)) === want.map(x => (x._1, x._2.toList)))
    // spot-check the interesting row
    assert(got.head._2 === Seq("t", "h", "e", "low", "est", "o", "f",
      "t", "h", "e", "n", "ewest"))
  }

  test("pretrained artifact is well-formed: lowercase pairs, unique, " +
       "every merged token derivable from earlier merges or single chars") {
    val ms = Bpe.pretrained
    assert(ms.nonEmpty)
    assert(ms.distinct === ms)
    val known = scala.collection.mutable.Set.empty[String]
    ms.foreach { case (l, r) =>
      assert(l.matches("[a-z]+") && r.matches("[a-z]+"))
      assert(l.length == 1 || known.contains(l), s"unreachable left '$l'")
      assert(r.length == 1 || known.contains(r), s"unreachable right '$r'")
      known += l + r
    }
  }

  test("wordCounts prunes the singleton tail before anything reaches " +
       "the driver (the 100 TB collect bound)") {
    // 'common' repeats; 'hash7f3a'-style singletons are the heaps'-law
    // tail that makes an unpruned vocabulary grow linearly with corpus
    val docs = Seq(
      (1L, "common words common words hashA"),
      (2L, "common words hashB"),
      (3L, "common hashC")
    ).toDF("doc_id", "text")
    val pruned = Bpe.wordCounts(docs, col("text")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pruned == Map("common" -> 4L, "words" -> 3L,
      "hasha" -> 1L, "hashb" -> 1L, "hashc" -> 1L).filter(_._2 >= 2L))
    // the unpruned form keeps the tail — that is exactly what minCount
    // removes
    val full = Bpe.wordCounts(docs, col("text"), minCount = 1).collect()
    assert(full.length == 5)
    // trained merges never touch singleton-only material
    val merges = Bpe.trainOnCorpus(docs, col("text"), nMerges = 64)
    assert(merges.nonEmpty)
    merges.foreach { case (l, r) =>
      assert(!(l + r).startsWith("hash") || (l + r).length < 5) }
  }

  test("pretrained == retraining on the sf0.01 corpus (the artifact is " +
       "reproducible, not hand-made)") {
    val docs = Tables(spark, "/root/testdata/sf0.01", "documents")
    val got = Bpe.trainOnCorpus(docs, col("text"), 48)
    assert(got === Bpe.pretrained)
  }
}
