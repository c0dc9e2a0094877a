package graft

import org.apache.spark.sql.functions._
import graft.operators.Diff

/** Snapshot diff (operators/Diff.scala): the four outcomes, null-safe
  * comparison, and the change-sized output contract. */
class DiffSpec extends TestSpark {
  import spark.implicits._

  test("snapshotDiff classifies insert/update/delete; null-safe compare") {
    val old = Seq(
      (1L, Some(10.0), "a"),   // unchanged
      (2L, Some(20.0), "b"),   // price update
      (3L, None,       "c"),   // null -> value update
      (4L, Some(40.0), "d"),   // deleted in new
      (6L, None,       "f")    // unchanged with a null (null <=> null)
    ).toDF("k", "price", "tag")
    val nu = Seq(
      (1L, Some(10.0), "a"),
      (2L, Some(21.0), "b"),
      (3L, Some(30.0), "c"),
      (5L, Some(50.0), "e"),   // inserted
      (6L, None,       "f")
    ).toDF("k", "price", "tag")
    val out = Diff.snapshotDiff(old, nu, keys = Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(out === Map(2L -> "update", 3L -> "update",
      4L -> "delete", 5L -> "insert"))
  }

  test("snapshotDiff rejects mismatched schemas") {
    val a = Seq((1L, 1.0)).toDF("k", "x")
    val b = Seq((1L, 1.0)).toDF("k", "y")
    intercept[IllegalArgumentException] {
      Diff.snapshotDiff(a, b, keys = Seq("k"))
    }
  }

  test("applyChangeset: upsert + delete semantics on a known fixture") {
    import org.apache.spark.sql.functions._
    val snap = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"))
      .toDF("k", "price", "tag")
    val chg = Seq(
      (2L, 21.0, "b", "update"),
      (3L, 0.0, "", "delete"),
      (4L, 40.0, "d", "insert"))
      .toDF("k", "price", "tag", "op")
    val out = Diff.applyChangeset(snap, chg, keys = Seq("k"))
      .orderBy("k").as[(Long, Double, String)].collect().toSeq
    assert(out === Seq((1L, 10.0, "a"), (2L, 21.0, "b"), (4L, 40.0, "d")))
  }

  test("applyChangeset: seq column resolves intra-batch ordering, " +
      "latest wins; same-seq ties fail loudly") {
    import org.apache.spark.sql.functions._
    val snap = Seq((1L, 10.0)).toDF("k", "price")
    val chg = Seq(
      (1L, 11.0, "update", 1L),
      (1L, 12.0, "update", 2L), // latest — must win
      (2L, 20.0, "insert", 1L))
      .toDF("k", "price", "op", "seq")
    val out = Diff.applyChangeset(snap, chg, keys = Seq("k"),
        seqCol = Some("seq"))
      .orderBy("k").as[(Long, Double)].collect().toSeq
    assert(out === Seq((1L, 12.0), (2L, 20.0)))
    val tied = Seq((1L, 11.0, "update", 5L), (1L, 12.0, "update", 5L))
      .toDF("k", "price", "op", "seq")
    val e = intercept[Exception] {
      Diff.applyChangeset(snap, tied, keys = Seq("k"),
        seqCol = Some("seq")).collect()
    }
    assert(e.getMessage.contains("multiple changes") ||
      (e.getCause != null && e.getCause.getMessage.contains("multiple changes")),
      e.toString)
  }

  test("applyChangeset: key-duplicate batch without a seq column and " +
      "unknown op values both fail loudly (no arbitrary winner, no " +
      "silent drop)") {
    val snap = Seq((1L, 10.0)).toDF("k", "price")
    val dup = Seq((1L, 11.0, "update"), (1L, 12.0, "update"))
      .toDF("k", "price", "op")
    val e1 = intercept[Exception] {
      Diff.applyChangeset(snap, dup, keys = Seq("k")).collect()
    }
    assert(e1.toString.contains("multiple changes") ||
      e1.getCause != null, e1.toString)
    val typo = Seq((1L, 11.0, "upsert")).toDF("k", "price", "op")
    val e2 = intercept[Exception] {
      Diff.applyChangeset(snap, typo, keys = Seq("k")).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + msgs(t.getCause)
    assert(msgs(e2).contains("unknown op"), e2.toString)
  }

  test("applyChangeset inverts snapshotDiff: old + (diff enriched " +
      "with new payload) == new") {
    import org.apache.spark.sql.functions._
    val old = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .filter(col("o_orderkey") % 101 =!= 0)
    val nu = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .filter(col("o_orderkey") % 103 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
    val diff = Diff.snapshotDiff(old, nu, keys = Seq("o_orderkey"))
    // enrich: insert/update payload from nu; delete payload from old
    val chg = diff.as("d")
      .join(nu.as("n"), col("d.o_orderkey") === col("n.o_orderkey"), "left")
      .join(old.as("o"), col("d.o_orderkey") === col("o.o_orderkey"), "left")
      .select(col("d.o_orderkey").as("o_orderkey"),
        coalesce(col("n.o_custkey"), col("o.o_custkey")).as("o_custkey"),
        coalesce(col("n.o_totalprice"), col("o.o_totalprice")).as("o_totalprice"),
        col("d.status").as("op"))
    val applied = Diff.applyChangeset(old, chg, keys = Seq("o_orderkey"))
    assert(applied.count() === nu.count())
    assert(applied.exceptAll(nu).isEmpty && nu.exceptAll(applied).isEmpty)
  }

  test("rangeDigest: order/partitioning-independent triples; " +
      "checksumDiff classifies only_a/only_b/mismatch and is empty " +
      "for identical replicas") {
    val a = (0L until 200L).map(k => (k, s"v$k")).toDF("k", "v")
    def digest(df: org.apache.spark.sql.DataFrame) =
      Diff.rangeDigest(df, col("k"), 50L,
        Seq(col("k").cast("string"), col("v")))
    // same rows, different physical order → identical digests
    val da = digest(a)
    val shuffled = digest(a.repartition(7).orderBy(col("k").desc))
    assert(da.orderBy("range_id").collect().toSeq ===
      shuffled.orderBy("range_id").collect().toSeq)
    assert(Diff.checksumDiff(da, shuffled).count() === 0L)
    // replica b: row 10 dropped (mismatch in range 0), row 60 edited
    // (mismatch in range 1), ranges [150, 200) dropped (only_a),
    // keys 1000..1004 appended (only_b in range 20)
    val b = a.filter(col("k") =!= 10 && col("k") < 150)
      .withColumn("v", when(col("k") === 60, lit("edited"))
        .otherwise(col("v")))
      .unionByName((1000L until 1005L).map(k => (k, s"v$k")).toDF("k", "v"))
    val got = Diff.checksumDiff(da, digest(b))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(0L -> "mismatch", 1L -> "mismatch",
      3L -> "only_a", 20L -> "only_b"))
  }

  test("rangeDigest: the row rendering is INJECTIVE — a delimiter in " +
      "the data or a repositioned NULL changes the digest, a NULL " +
      "column keeps the row counted, and a negative key fails loudly") {
    def digest(rows: Seq[(Long, String, String)]) =
      Diff.rangeDigest(rows.toDF("k", "a", "b"), col("k"), 100L,
        Seq(col("a"), col("b"))).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // '|' in the data must not shift column boundaries
    assert(digest(Seq((1L, "a|b", "c"))) !== digest(Seq((1L, "a", "b|c"))),
      "delimiter injection collided")
    // backslash near the delimiter must not collide with the escape
    assert(digest(Seq((1L, "a\\", "c"))) !== digest(Seq((1L, "a", "\\c"))))
    // NULL position matters, and a NULL is not the empty string...
    assert(digest(Seq((1L, null, "y"))) !== digest(Seq((1L, "y", null))))
    assert(digest(Seq((1L, null, "y"))) !== digest(Seq((1L, "", "y"))))
    // ...nor the literal sentinel rendering
    assert(digest(Seq((1L, null, "y"))) !== digest(Seq((1L, "\\0", "y"))))
    // a row with a NULL column still counts into its range
    assert(digest(Seq((1L, null, null))).head._2 === 1L)
    // negative keys: floor/truncation division disagree across
    // engines — refuse instead of silently mis-ranging
    val e = intercept[Exception] {
      Diff.rangeDigest(Seq((-1L, "x")).toDF("k", "v"), col("k"), 100L,
        Seq(col("v"))).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + msgs(t.getCause)
    assert(msgs(e).contains("negative key"), e.toString)
  }

  test("md5_prefix52: bit-identical to the composable " +
      "conv(substring(md5(s),1,13),16,10) spelling, incl. multibyte, " +
      "empty, delimiter-heavy and long strings") {
    val samples = Seq("", "a", "héllo wörld — ünïcode ¤",
      "日本語テキスト", "a|b\\c|d", "x" * 10000,
      "42|O|12345", "\\0", "0123456789abcdef" * 33)
    val df = samples.toDF("s")
    val fast = org.apache.spark.sql.GraftInternal.column(
      graft.functions.Md5Prefix52(
        org.apache.spark.sql.GraftInternal.expression(col("s"))))
    val rows = df.select(fast.as("f"),
        expr("CAST(conv(substring(md5(s), 1, 13), 16, 10) AS BIGINT)")
          .as("g"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // null in → null out, like every nullSafeEval expression
    assert(Seq[String](null).toDF("s").select(fast).head().isNullAt(0))
  }

  test("scd2History: versions open at their seq and close at the next " +
      "change; deletes close and leave a gap; duplicate (key, seq) " +
      "and unknown ops fail loudly") {
    val chg = Seq(
      (1L, 1L, "insert", 10.0),  // [1, 3) closed by the update
      (1L, 3L, "update", 11.0),  // [3, ∞) current
      (2L, 1L, "insert", 20.0),  // [1, 2) closed by the delete
      (2L, 2L, "delete", 0.0),   //   gap [2, 5)
      (2L, 5L, "insert", 21.0),  // [5, ∞) current — the revive
      (3L, 4L, "update", 30.0))  // update-on-absent opens (upsert)
      .toDF("k", "seq", "op", "v")
    val out = Diff.scd2History(chg, keys = Seq("k"))
      .orderBy("k", "valid_from")
      .as[(Long, Double, Long, Option[Long], Boolean)]
      .collect().toSeq
    assert(out === Seq(
      (1L, 10.0, 1L, Some(3L), false),
      (1L, 11.0, 3L, None, true),
      (2L, 20.0, 1L, Some(2L), false),
      (2L, 21.0, 5L, None, true),
      (3L, 30.0, 4L, None, true)))
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + msgs(t.getCause)
    val dup = Seq((1L, 1L, "insert", 1.0), (1L, 1L, "update", 2.0))
      .toDF("k", "seq", "op", "v")
    val e1 = intercept[Exception] {
      Diff.scd2History(dup, keys = Seq("k")).collect()
    }
    assert(msgs(e1).contains("duplicate seq"), e1.toString)
    // a typo'd op closing an interval must fail even though the
    // delete filter would have kept the row — and one on a row the
    // output FILTERS must fail too (per-row vocabulary check)
    val typo = Seq((1L, 1L, "upsert", 1.0)).toDF("k", "seq", "op", "v")
    val e2 = intercept[Exception] {
      Diff.scd2History(typo, keys = Seq("k")).collect()
    }
    assert(msgs(e2).contains("unknown op"), e2.toString)
  }

  test("snapshotAsOf: the table AS OF s equals the changelog truncated " +
      "at s and applied batch-by-batch — the CDC round-trip law at " +
      "every seq") {
    val chg = Seq(
      (1L, 10.0, "insert", 1L), (2L, 20.0, "insert", 1L),
      (3L, 30.0, "insert", 1L),
      (1L, 11.0, "update", 2L),
      (2L, 0.0, "delete", 3L),
      (2L, 21.0, "insert", 4L), (3L, 31.0, "update", 4L))
      .toDF("k", "v", "op", "seq")
    val hist = Diff.scd2History(chg, keys = Seq("k"))
    val empty = chg.select(col("k"), col("v")).filter(lit(false))
    for (s <- 1L to 4L) {
      val asOf = Diff.snapshotAsOf(hist, s)
        .select("k", "v").as[(Long, Double)].collect().toSet
      val ref = (1L to s).foldLeft(empty) { (snap, i) =>
        Diff.applyChangeset(snap,
          chg.filter(col("seq") === i).drop("seq"), keys = Seq("k"))
      }.as[(Long, Double)].collect().toSet
      assert(asOf === ref, s"as-of $s")
    }
    // spot checks: the delete window and the revive
    assert(Diff.snapshotAsOf(hist, 3L).select("k", "v")
      .as[(Long, Double)].collect().toSet ===
      Set((1L, 11.0), (3L, 30.0)))
    assert(Diff.snapshotAsOf(hist, 4L).select("k", "v")
      .as[(Long, Double)].collect().toSet ===
      Set((1L, 11.0), (2L, 21.0), (3L, 31.0)))
  }

  test("applyChangeset: an unknown op on a change row that LOSES the " +
      "seq race still fails loudly (vocabulary is checked per row, " +
      "before the winner filter)") {
    val snap = Seq((1L, 10.0)).toDF("k", "price")
    val chg = Seq(
      (1L, 11.0, "upsert", 1L),  // mislabeled op, loses to seq 2
      (1L, 12.0, "update", 2L))
      .toDF("k", "price", "op", "seq")
    val e = intercept[Exception] {
      Diff.applyChangeset(snap, chg, keys = Seq("k"),
        seqCol = Some("seq")).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + msgs(t.getCause)
    assert(msgs(e).contains("unknown op"), e.toString)
  }
}
