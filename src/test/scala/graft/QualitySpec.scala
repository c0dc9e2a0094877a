package graft

import org.apache.spark.sql.functions._

/** Laws for the q79/t18/q80 data-quality family — every gated number is
  * recomputed here through an independent spelling (filters and joins
  * instead of CASE-counts and literal maps) on the same tables.
  */
class QualitySpec extends TestSpark {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q79: every rule's count matches an independently spelled filter") {
    val out = q("q79_dq_audit").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set("r1_null_custkey", "r2_price_range",
      "r3_status_domain", "r4_dup_orderkey", "r5_orphan_lineitem",
      "r6_childless_order"))
    val o = Tables(spark, sfDir, "orders")
    val li = Tables(spark, sfDir, "lineitem")
    assert(out("r1_null_custkey") === o.filter(col("o_custkey").isNull).count())
    assert(out("r2_price_range") ===
      o.filter(col("o_totalprice").isNull ||
        col("o_totalprice") <= 0.0 || col("o_totalprice") > 450000.0).count())
    assert(out("r3_status_domain") === 0)
    assert(out("r4_dup_orderkey") ===
      o.count() - o.select("o_orderkey").distinct().count())
    assert(out("r5_orphan_lineitem") ===
      li.count() - li.join(o, col("l_orderkey") === col("o_orderkey"),
        "left_semi").count())
    // childless = parents minus parents-with-children (orphans are zero
    // on this data, so the semi-join count IS the children's parent set)
    assert(out("r6_childless_order") ===
      o.count() - o.join(li, col("o_orderkey") === col("l_orderkey"),
        "left_semi").count())
    assert(out("r6_childless_order") > 0,
      "the synthetic data has childless orders — the audit must see them")
  }

  test("q79: a planted violation of each row-local rule is counted " +
       "(nulls count as violations, not skipped rows)") {
    val bad = Seq(
      (java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Double], "O"),
      (null.asInstanceOf[java.lang.Long], java.lang.Double.valueOf(10.0), "X"),
      (java.lang.Long.valueOf(1L), java.lang.Double.valueOf(500000.0), "F"))
      .toDF("o_orderkey", "o_totalprice", "o_orderstatus")
    val r = bad.agg(
      count(when(col("o_totalprice").isNull ||
        !(col("o_totalprice") > 0.0 && col("o_totalprice") <= 450000.0),
        1)).as("r2"),
      count(when(col("o_orderstatus").isNull ||
        !col("o_orderstatus").isin("O", "F", "P"), 1)).as("r3"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("r4"))
      .head()
    assert(r.getLong(0) === 2, "null price + out-of-range price")
    assert(r.getLong(1) === 1, "status X")
    // countDistinct ignores the NULL key: 3 rows - 1 distinct key = 2,
    // which deliberately counts the null-keyed row as a dup violation —
    // a null key can't prove uniqueness
    assert(r.getLong(2) === 2)
  }

  test("t18: stage counts sum to the corpus and each stage equals its " +
       "independently spelled first-failing filter") {
    val docs = Tables(spark, sfDir, "documents")
    val out = q("t18_filter_attrition").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.sum === docs.count(), "attrition partitions the corpus")
    val short = docs.filter(col("n_chars") < 120)
    val lang = docs.filter(col("n_chars") >= 120 &&
      !col("lang").isin("en", "es", "de", "fr"))
    assert(out("1_too_short") === short.count())
    assert(out("2_lang_filter") === lang.count())
    assert(out.getOrElse("3_repetitive", 0L) > 0,
      "the repetition rule fires on this corpus")
    assert(out.getOrElse("0_survived", 0L) > 0, "some docs survive")
  }

  test("t18: ordering is first-failing — a doc failing BOTH length and " +
       "language is attributed to length only") {
    val one = Seq((1L, "zh zh", "zh", 5L)).toDF("doc_id", "text", "lang", "n_chars")
    val toks = graft.operators.TextAnalysis.tokenCount(col("text")).cast("double")
    val uniq = size(array_distinct(split(trim(col("text")), "\\s+"))).cast("double")
    val stage = when(col("n_chars") < 120, "1_too_short")
      .when(!col("lang").isin("en", "es", "de", "fr"), "2_lang_filter")
      .when(uniq / toks < 0.45, "3_repetitive")
      .otherwise("0_survived")
    assert(one.select(stage).head().getString(0) === "1_too_short")
  }

  test("q80: outlier counts match a two-sided filter recomputed from " +
       "driver-side exact stats, and the 1.5-sigma rule fires") {
    val li = Tables(spark, sfDir, "lineitem")
    val out = q("q80_group_outliers").collect()
    assert(out.length === 3)
    for (r <- out) {
      val g = r.getString(0)
      val rows = li.filter(col("l_returnflag") === g)
        .select("l_extendedprice").as[Double].collect()
      assert(r.getLong(1) === rows.length)
      // independent spelling: exact decimal sums folded on the driver
      // (dsum's documented per-row conversion — shortest-decimal
      // HALF_UP at scale 4 — but a different accumulator and order)
      def d4(v: Double): BigDecimal = BigDecimal(
        java.math.BigDecimal.valueOf(v).setScale(4,
          java.math.RoundingMode.HALF_UP))
      val n = rows.length.toDouble
      val sx = rows.map(d4).foldLeft(BigDecimal(0))(_ + _).toDouble
      val sxx = rows.map(v => d4(v * v)).foldLeft(BigDecimal(0))(_ + _)
        .toDouble
      val mean = sx / n
      val thr = 1.5 * math.sqrt(math.max(sxx / n - mean * mean, 0.0))
      val expected = rows.count(v => math.abs(v - mean) > thr)
      assert(r.getLong(2) === expected, s"group $g")
      assert(r.getLong(2) > 0, s"1.5-sigma fires on near-uniform data ($g)")
      assert(r.getLong(2) < rows.length, s"not everything is an outlier ($g)")
    }
  }

  test("q81: rolling anomalies match a driver-side sliding window over " +
       "the same total order, and only full-history rows score") {
    val ev = Tables(spark, sfDir, "events")
    val out = q("q81_rolling_anomaly").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for ((tpe, (nScored, nAnom)) <- out) {
      val rows = ev.filter(col("event_type") === tpe)
        .select("ts", "event_id", "value").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2)))
        .sortBy(r => (r._1, r._2)).map(_._3)
      assert(nScored === math.max(0, rows.length - 100).toLong, tpe)
      def d4(v: Double) = BigDecimal(java.math.BigDecimal.valueOf(v)
        .setScale(4, java.math.RoundingMode.HALF_UP))
      val expected = (100 until rows.length).count { i =>
        val f = rows.slice(i - 100, i)
        val sx = f.map(d4).sum.toDouble
        val sxx = f.map(v => d4(v * v)).sum.toDouble
        val mean = sx / 100.0
        rows(i) > mean + 1.5 * math.sqrt(
          math.max(sxx / 100.0 - mean * mean, 0.0))
      }
      assert(nAnom === expected.toLong, tpe)
    }
    assert(out.values.map(_._2).sum > 0, "the gauge fires on real data")
  }

  test("q81: the frame excludes the scored row — a spike over a constant " +
       "baseline flags itself instead of suppressing itself via its own " +
       "contribution to sigma") {
    import org.apache.spark.sql.expressions.Window
    val base = (1 to 100).map(i => (i.toLong, 10.0)) :+ (101L, 11.0)
    val df = base.toDF("event_id", "value").repartition(5)
    val f = Window.orderBy("event_id").rowsBetween(-100, -1)
    val scored = df
      .withColumn("n", count(lit(1)).over(f))
      .withColumn("sx", sum(col("value").cast(graft.queries.D4)).over(f)
        .cast("double"))
      .withColumn("sxx", sum((col("value") * col("value"))
        .cast(graft.queries.D4)).over(f).cast("double"))
      .filter(col("n") === 100)
      .collect()
    assert(scored.length === 1)
    val r = scored.head
    val mean = r.getAs[Double]("sx") / 100.0
    val sd = math.sqrt(math.max(
      r.getAs[Double]("sxx") / 100.0 - mean * mean, 0.0))
    assert(mean === 10.0 && sd === 0.0,
      "constant baseline: exact mean, zero sigma")
    assert(r.getAs[Double]("value") > mean + 1.5 * sd, "the spike flags")
  }

  test("q81: the chunk-carry arithmetic is exact across boundaries — a " +
       "fixture big enough to split into many chunks (the sf0.001 gate " +
       "merges each type to ONE chunk, so this is the only spec-level " +
       "exercise of lag-through-carry) matches a driver-side sliding " +
       "window row-for-row") {
    // 2 types x 1500 rows: at 8+ chunks each chunk holds ~180 rows,
    // so every chunk boundary forces lag(cum, 101) through the carried
    // copy of the previous chunk. Values are deterministic with enough
    // spread that anomalies land on both sides of chunk boundaries.
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val rows = for {
      t <- Seq("a", "b"); i <- 1 to 1500
    } yield (
      (t.hashCode.toLong * 100000) + i,
      new java.sql.Timestamp(ts0 + i * 1000L),
      t,
      10.0 + (i % 37) * 0.25 + (if (i % 211 == 0) 9.0 else 0.0))
    val dir = java.nio.file.Files.createTempDirectory("q81carry").toString
    rows.toDF("event_id", "ts", "event_type", "value")
      .repartition(7).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q81_rolling_anomaly")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    def d4(v: Double) = BigDecimal(java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP))
    for (t <- Seq("a", "b")) {
      val vs = rows.filter(_._3 == t).sortBy(r => (r._2.getTime, r._1))
        .map(_._4)
      val expected = (100 until vs.length).count { i =>
        val f = vs.slice(i - 100, i)
        val sx = f.map(d4).sum.toDouble
        val sxx = f.map(v => d4(v * v)).sum.toDouble
        val mean = sx / 100.0
        vs(i) > mean + 1.5 * math.sqrt(
          math.max(sxx / 100.0 - mean * mean, 0.0))
      }
      assert(out(t)._1 === (vs.length - 100).toLong, t)
      assert(out(t)._2 === expected.toLong, t)
      assert(expected > 0, s"fixture must fire anomalies for $t")
    }
  }

  test("q82: attribution picks the newest prior non-purchase within the " +
       "lookback, skips interleaved purchases, and sends stale or " +
       "touchless purchases to (none)") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    def at(h: Long) = new java.sql.Timestamp(ts0.getTime + h * 3600 * 1000)
    val ev = Seq(
      // user 1: view then click then purchase -> click (newest touch)
      (1L, at(0), 1L, "view", 1.0),
      (2L, at(1), 1L, "click", 1.0),
      (3L, at(2), 1L, "purchase", 10.0),
      // ...and a SECOND purchase right after: the interleaved purchase
      // is skipped, still attributed to click
      (4L, at(3), 1L, "purchase", 20.0),
      // user 2: touch 8 days before purchase -> (none)
      (5L, at(0), 2L, "view", 1.0),
      (6L, at(8 * 24 + 1), 2L, "purchase", 30.0),
      // user 3: purchase with no prior event -> (none)
      (7L, at(0), 3L, "purchase", 40.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(7)
    ev.createOrReplaceTempView("q82_fixture")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = last(when(col("event_type") =!= "purchase",
      struct(col("ts").as("tts"), col("event_type").as("ttype"))),
      ignoreNulls = true).over(w)
    val got = ev.withColumn("t", touch)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"),
        when(col("t").isNotNull &&
          col("t.tts") >= col("ts") - expr("interval 7 days"),
          col("t.ttype")).otherwise("(none)").as("touch_type"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(3L -> "click", 4L -> "click",
      6L -> "(none)", 7L -> "(none)"))
  }

  test("chunk_stats_tail (q81's fused stats pass): sums are exact and " +
       "the last-k tail is identical under ANY partitioning — the " +
       "merge keeps the k largest (ts, id) keys of the union, so " +
       "partials compose scan-order-independently") {
    import graft.functions.ChunkStatsFunctions
    val n = 5000
    val rows = (1 to n).map { i =>
      (i.toLong * 7 % 4999, i.toLong, 10.0 + (i % 37) * 0.25)
    }
    def stats(parts: Int) = rows.toDF("tsl", "id", "v")
      .repartition(parts)
      .agg(ChunkStatsFunctions.chunkStatsTail(col("tsl"), col("id"),
        col("v").cast(graft.queries.D4),
        (col("v") * col("v")).cast(graft.queries.D4), 101).as("st"))
      .select("st.n", "st.sx", "st.sxx", "st.tail").head()
    val one = stats(1)
    val many = stats(13)
    assert(one === many, "partitioning changed the fused stats")
    assert(one.getLong(0) === n.toLong)
    // exact decimal sums vs a driver-side fold
    def d4(v: Double) = BigDecimal(java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP))
    assert(BigDecimal(one.getDecimal(1)) === rows.map(r => d4(r._3)).sum)
    assert(BigDecimal(one.getDecimal(2)) ===
      rows.map(r => d4(r._3 * r._3)).sum)
    // the tail is exactly the 101 largest (tsl, id) keys, ascending
    val tail = one.getSeq[org.apache.spark.sql.Row](3)
    val want = rows.map(r => (r._1, r._2)).sorted.takeRight(101)
    assert(tail.map(r => (r.getLong(0), r.getLong(1))) === want)
  }

  test("chunk_stats_tail enforces the (ts, id) uniqueness contract " +
       "loudly — a duplicate tail key would silently corrupt the " +
       "carry suffix sums, so it must throw, not overwrite") {
    import graft.functions.ChunkStatsFunctions
    val dup = Seq((5L, 7L, 1.0), (5L, 7L, 2.0)).toDF("tsl", "id", "v")
    val e = intercept[Exception] {
      dup.agg(ChunkStatsFunctions.chunkStatsTail(col("tsl"), col("id"),
        col("v").cast(graft.queries.D4),
        (col("v") * col("v")).cast(graft.queries.D4), 101)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("duplicate (ts, id)")), e.getMessage)
  }

  test("q82 gate: conversions partition the purchases and revenue adds up") {
    val ev = Tables(spark, sfDir, "events")
    val out = q("q82_attribution").collect()
    assert(out.map(_.getLong(1)).sum ===
      ev.filter(col("event_type") === "purchase").count())
    assert(out.map(_.getString(0)).contains("(none)"))
    assert(!out.map(_.getString(0)).contains("purchase"),
      "a purchase never attributes to a purchase")
  }
}
