package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends TestSpark {
  import spark.implicits._

  test("tokenCount handles blanks, runs of whitespace, and plain text") {
    val df = Seq("", "   ", "one", "a b  c", " padded  words ").toDF("text")
      .select(TextAnalysis.tokenCount(col("text")).as("n"))
    assert(df.as[Long].collect().toSeq === Seq(0L, 0L, 1L, 3L, 2L))
  }

  test("subwordCount splits letter/digit/symbol runs") {
    val n = Seq("hello world42, ok!").toDF("text")
      .select(TextAnalysis.subwordCount(col("text"))).as[Long].head()
    // hello | world | 42 | , | ok | !
    assert(n === 6L)
  }

  test("quality score (bp) is bounded and monotone in fluency") {
    val df = Seq(
      ("fluent", ("the cat sat on the mat and it is a fine day " * 5).trim),
      ("punct soup", "..!!;;;..??!!..;;..!!..??..;;..!!"),
      ("empty", "")
    ).toDF("kind", "text")
      .select(col("kind"), TextAnalysis.qualityScoreBp(col("text")).as("bp"))
    val m = df.as[(String, Long)].collect().toMap
    assert(m.values.forall(bp => bp >= 0L && bp <= 10000L))
    assert(m("fluent") > m("punct soup"))
    assert(m("empty") === 3000L) // only the no-punctuation term survives
  }

  test("langId votes by characteristic stopwords") {
    val df = Seq(
      ("en", "the cat and the dog went to the park and it is big"),
      ("de", "der hund und die katze ist nicht da und ich bin ein mensch"),
      ("fr", "le chien et la maison est que je ne sais pas les choses"),
      ("es", "el perro y la casa es que no tiene un gato y los libros"),
      ("zh", "的 是 不 了 在 我 有 他 的 是"),
      ("und", "xyzzy plugh quux")
    ).toDF("expected", "text")
      .select(col("expected"), TextAnalysis.langId(col("text")).as("got"))
    df.as[(String, String)].collect().foreach { case (exp, got) =>
      assert(got === exp, s"expected $exp got $got")
    }
  }

  test("fingerprint: equal normalized text collides, different text does not") {
    val fps = Seq(
      (1L, "Hello   World"),
      (2L, "hello world"),        // same after normalization
      (3L, "hello worlds")
    ).toDF("id", "text")
      .select(col("id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("fingerprint is stable across the real corpus (no collisions on 500 distinct docs)") {
    val d = Tables(spark, sfDir, "documents")
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))
    assert(d.distinct().count() === d.count())
  }

  test("bigram repetition counts duplicate bigram occurrences") {
    val got = Seq(
      (1L, "a b a b a b"),   // bigrams: ab ba ab ba ab → 5 total, 2 distinct
      (2L, "all words here differ totally"), // 4 bigrams, no repeats
      (3L, "single"),        // no bigrams
      (4L, "")               // no bigrams
    ).toDF("id", "text")
      .select(col("id"), TextAnalysis.bigramRepetition(col("text")).as("r"))
      .select(col("id"), col("r.n_bigrams"), col("r.n_dup"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(1L) === ((5L, 3L)))
    assert(got(2L) === ((4L, 0L)))
    assert(got(3L) === ((0L, 0L)))
    assert(got(4L) === ((0L, 0L)))
  }
}
