package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends TestSpark {
  import spark.implicits._

  test("range join matches a naive filter join on synthetic data") {
    val left = Seq(("A", 0L, 1), ("A", 95L, 2), ("B", 10L, 3), ("A", 200L, 4))
      .toDF("k", "t", "lid")
    val right = Seq(("A", 5L, 10), ("A", 99L, 11), ("A", 100L, 12),
                    ("B", 10L, 13), ("B", 200L, 14), ("C", 0L, 15))
      .toDF("k2", "t2", "rid")

    val got = RangeJoin(left, col("k"), col("t"),
        right, col("k2"), col("t2"), window = 100L)
      .select("lid", "rid").as[(Int, Int)].collect().toSet

    val want = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k2") &&
        col("r.t2") >= col("l.t") && col("r.t2") < col("l.t") + 100L)
      .select("lid", "rid").as[(Int, Int)].collect().toSet

    assert(got === want)
    assert(got.contains((1, 10)) && got.contains((1, 11)))  // within window
    assert(!got.contains((1, 12)))                          // t2=100 excluded
    assert(got.contains((2, 12)))                           // crosses bucket edge
  }

  test("range join plans as an equi hash join, not nested loop") {
    val e = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("tsec"))
    val p = RangeJoin(e, col("user_id"), col("tsec"),
        e.select(col("event_id").as("e2"), col("user_id").as("u2"), col("tsec").as("t2")),
        col("u2"), col("t2"), 3600L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("sql extension functions are registered") {
    val r = spark.sql(
      "SELECT float_vector_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
      "array(cast(3.0 as float), cast(4.0 as float))) AS d").as[Double].head()
    assert(r === 11.0)
    val sig = spark.sql(
      "SELECT minhash_signature(array(1L, 2L, 3L), 8, 42) AS s")
      .selectExpr("size(s)").as[Int].head()
    assert(sig === 8)
  }

  test("approx distinct stays within 10% of exact") {
    val rows = SparkEntry.queries("q28_approx_distinct")(spark, sfDir)
      .select("approx_cust", "exact_cust").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.1,
        s"approx $approx vs exact $exact")
    }
  }

  test("KMV distinct estimate stays within 20% of exact per group") {
    val est = SparkEntry.queries("q43_kmv_distinct")(spark, sfDir)
      .as[(String, Long)].collect().toMap
    val exact = Tables(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (flag, e) =>
      val x = exact(flag)
      // below k=256 distinct the estimate IS the exact count; above it
      // the k-minimum-values error is ~1/sqrt(k) ≈ 6% — 20% is slack
      assert(math.abs(e - x).toDouble / x < 0.2, s"$flag: kmv $e vs exact $x")
    }
  }
}
