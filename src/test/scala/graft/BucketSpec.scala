package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sinks.ParquetSink

/** Evidence for SURVEY §4's "bucketing for co-located joins": two
  * tables bucketed on the join key join WITHOUT any Exchange — the
  * shuffle that dominates a 100 TB fact-fact join is paid once at
  * write time and never again.
  */
class BucketSpec extends TestSpark {

  test("join of two tables bucketed on the key runs with zero Exchange") {
    val dir = Files.createTempDirectory("buckets").toString
    val orders = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    ParquetSink.writeBucketed(orders, "orders_b", s"$dir/orders_b",
      buckets = 8, bucketBy = Seq("o_orderkey"))
    ParquetSink.writeBucketed(lineitem, "lineitem_b", s"$dir/lineitem_b",
      buckets = 8, bucketBy = Seq("l_orderkey"))
    val savedBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a merge join — at test scale everything broadcasts, which
      // would hide the property under test (at 100 TB fact⋈fact never
      // broadcasts)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum("l_quantity").as("qty"))
      // correctness: same result as the plain (shuffling) join
      val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
      assert(joined.orderBy("o_orderkey").collect().toSeq ===
        plain.orderBy("o_orderkey").collect().toSeq)
      // plan: the join itself is exchange-free (the only Exchange
      // allowed is the final orderBy's range partitioning, absent here)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning"), p)
      assert(p.contains("SelectedBucketsCount"), p)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcast)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("q68 over a bucketed snapshot: the snapshot side of the merge " +
      "pays NO exchange — only the change batch shuffles (the 100 TB " +
      "daily-merge contract applyChangeset's doc claims)") {
    import graft.operators.Diff
    import java.nio.file.Files
    val savedBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dir = Files.createTempDirectory("ups-bucket").toString
      // bucket count must equal the join's partition count or the
      // bucketed side's HashPartitioning cannot satisfy the SMJ's
      // required distribution and Spark re-shuffles it anyway — the
      // same bucket-sizing contract q65 documents
      val nb = spark.conf.get("spark.sql.shuffle.partitions").toInt
      graft.sinks.ParquetSink.writeBucketed(
        Tables(spark, sfDir, "orders")
          .select("o_orderkey", "o_totalprice"),
        "orders_snap_b", s"$dir/orders_snap_b", nb, Seq("o_orderkey"))
      val snap = spark.table("orders_snap_b")
      val changes = Tables(spark, sfDir, "orders")
        .filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"),
          lit("update").as("op"))
      val merged = Diff.applyChangeset(snap, changes, keys = Seq("o_orderkey"))
      val p = merged.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") && p.contains("FullOuter"), p)
      // exactly one hash exchange: the CHANGE side (window + join
      // reuse it); the snapshot reads its buckets in place
      assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
      assert(p.contains("SelectedBucketsCount"), p)
      // and the merge is still correct over the bucketed layout
      val got = merged.agg(sum(col("o_totalprice"))).head().getDouble(0)
      val want = Tables(spark, sfDir, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1000.0)
            .otherwise(col("o_totalprice")).as("o_totalprice"))
        .agg(sum(col("o_totalprice"))).head().getDouble(0)
      assert(math.abs(got - want) < 1e-6, s"$got vs $want")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcast)
      spark.sql("DROP TABLE IF EXISTS orders_snap_b")
    }
  }
}
