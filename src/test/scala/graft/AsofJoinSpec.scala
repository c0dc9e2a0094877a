package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofJoinSpec extends TestSpark {
  import spark.implicits._

  test("asof join picks the latest right row at or before each left time") {
    val quotes = Seq( // (key, time, price)
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)
    ).toDF("sym", "qt", "price")
    val trades = Seq( // (key, time)
      ("A", 5L),   // before any quote → null
      ("A", 10L),  // equal time → 1.0 (<= semantics)
      ("A", 25L),  // between → 2.0
      ("A", 99L),  // after all → 3.0
      ("B", 14L),  // before B's quote → null
      ("C", 50L)   // key with no quotes → null
    ).toDF("sym", "tt")

    val out = AsofJoin(trades, col("sym"), col("tt"),
        quotes, col("sym"), col("qt"), Seq("price"))
      .orderBy("sym", "tt")
      .select("sym", "tt", "price")
      .as[(String, Long, Option[Double])].collect().toSeq

    assert(out === Seq(
      ("A", 5L, None), ("A", 10L, Some(1.0)), ("A", 25L, Some(2.0)),
      ("A", 99L, Some(3.0)), ("B", 14L, None), ("C", 50L, None)))
  }

  test("asof join: matched row's NULL payload is preserved and all payload " +
       "columns come from the same right row") {
    val right = Seq( // (key, time, a, b)
      ("A", 10L, Some(1.0), Some("x")),
      ("A", 20L, None, Some("y")),      // latest at t>=20: a is GENUINELY null
      ("A", 30L, Some(3.0), None)       // latest at t>=30: b is GENUINELY null
    ).toDF("k", "rt", "a", "b")
    val left = Seq(("A", 25L), ("A", 35L)).toDF("k", "lt")
    val out = AsofJoin(left, col("k"), col("lt"), right, col("k"), col("rt"),
        Seq("a", "b"))
      .orderBy("lt").select("lt", "a", "b")
      .as[(Long, Option[Double], Option[String])].collect().toSeq
    // per-column last-non-null would wrongly return (25, 1.0, "y") and
    // (35, 3.0, "y") — values stitched from different right rows
    assert(out === Seq((25L, None, Some("y")), (35L, Some(3.0), None)))
  }

  test("asof join matches a naive per-row computation on real tables") {
    val o = Tables(spark, sfDir, "orders")
      .groupBy("o_custkey").agg(max("o_orderdate").as("last_date"))
    // events are all after every order, so asof payload = customer's
    // latest-date order — check a sample against the naive aggregate
    val sample = SparkEntry.queries("q26_asof_join")(spark, sfDir)
      .filter(col("o_orderkey").isNotNull).limit(50)
      .join(Tables(spark, sfDir, "orders").select(
        col("o_orderkey").as("ok2"), col("o_orderdate")),
        col("o_orderkey") === col("ok2"))
      .join(o, col("user_id") === col("o_custkey"))
    assert(sample.filter(col("o_orderdate") =!= col("last_date")).count() === 0)
  }
}
