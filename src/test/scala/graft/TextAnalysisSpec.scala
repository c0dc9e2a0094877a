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

  test("redactPii scrubs emails, IPs, phones in order without double counts") {
    def run(s: String): (Long, Long, Long, String) =
      Seq(s).toDF("text")
        .select(TextAnalysis.redactPii(col("text")).as("r"))
        .select(col("r.n_emails"), col("r.n_ips"), col("r.n_phones"),
          col("r.redacted"))
        .as[(Long, Long, Long, String)].head()

    assert(run("mail a.b+tag@sub.example.org now") ===
      ((1L, 0L, 0L, "mail [EMAIL] now")))
    assert(run("from 192.168.0.1 to 10.0.0.7") ===
      ((0L, 2L, 0L, "from [IP] to [IP]")))
    assert(run("call +4915512345678 please") ===
      ((0L, 0L, 1L, "call [PHONE] please")))
    // digits inside an email's local part are gone before the phone
    // pass — one email, zero phones
    assert(run("x +1234567890@example.com y") ===
      ((1L, 0L, 0L, "x [EMAIL] y")))
    // all three kinds in one line
    assert(run("u@d.co 1.2.3.4 +9876543210") ===
      ((1L, 1L, 1L, "[EMAIL] [IP] [PHONE]")))
    // no PII → text unchanged; redaction is idempotent
    val clean = "just ordinary words and numbers 42"
    assert(run(clean) === ((0L, 0L, 0L, clean)))
    assert(run("u@d.co 1.2.3.4")._4 ===
      run(run("u@d.co 1.2.3.4")._4)._4)
  }
}
