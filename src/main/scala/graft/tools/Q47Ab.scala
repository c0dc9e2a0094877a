package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the q47 shape over the bucketed layouts: where do the ~3 s go
  * at sf10 — the sizing job, the sketch build, the probe-side Bloom
  * evaluation, or the merge join itself?
  *
  * Usage: Q47Ab  (env SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
  */
object Q47Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{BloomJoin, Layout}
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    def orders = Layout.ensureBucketed(spark, graft.Tables(spark, sfDir, "orders"),
      s"orders_bk$tag", s"/tmp/graft_layout$tag/orders", 32, Seq("o_orderkey"))
    def li = Layout.ensureBucketed(spark, graft.Tables(spark, sfDir, "lineitem"),
      s"lineitem_bk$tag", s"/tmp/graft_layout$tag/lineitem", 32, Seq("l_orderkey"))
    orders.count(); li.count() // warm layouts + page cache

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 6).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"$name%-28s ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("sizing job (acd)") {
      orders.filter(col("o_totalprice") > 400000)
        .agg(approx_count_distinct(col("o_orderkey"))).head()
    }
    time("plain bucketed filtered join") {
      sink(li.join(orders.filter(col("o_totalprice") > 400000),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt")))
    }
    time("bloom join 16b/key (gate)") {
      sink(BloomJoin.autoSizedPrefilteredJoin(
          li, col("l_orderkey"),
          orders.filter(col("o_totalprice") > 400000), col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt")))
    }
    time("bloom join 8b/key") {
      sink(BloomJoin.autoSizedPrefilteredJoin(
          li, col("l_orderkey"),
          orders.filter(col("o_totalprice") > 400000), col("o_orderkey"),
          bitsPerKey = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt")))
    }
    time("bloom join 8b/key k=2") {
      sink(BloomJoin.autoSizedPrefilteredJoin(
          li, col("l_orderkey"),
          orders.filter(col("o_totalprice") > 400000), col("o_orderkey"),
          bitsPerKey = 8, numHashes = 2)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt")))
    }
    time("selfsized 16b/key k=3") {
      sink(BloomJoin.selfSizedPrefilteredJoin(
          li, col("l_orderkey"),
          orders.filter(col("o_totalprice") > 400000), col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt")))
    }
    time("selfsized 8b/key k=2") {
      sink(BloomJoin.selfSizedPrefilteredJoin(
          li, col("l_orderkey"),
          orders.filter(col("o_totalprice") > 400000), col("o_orderkey"),
          bitsPerKey = 8, numHashes = 2)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt")))
    }
    time("selfsized 4b/key k=2") {
      sink(BloomJoin.selfSizedPrefilteredJoin(
          li, col("l_orderkey"),
          orders.filter(col("o_totalprice") > 400000), col("o_orderkey"),
          bitsPerKey = 4, numHashes = 2)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt")))
    }
    time("bloom join 4b/key k=2") {
      sink(BloomJoin.autoSizedPrefilteredJoin(
          li, col("l_orderkey"),
          orders.filter(col("o_totalprice") > 400000), col("o_orderkey"),
          bitsPerKey = 4, numHashes = 2)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt")))
    }
    spark.stop()
  }
}
