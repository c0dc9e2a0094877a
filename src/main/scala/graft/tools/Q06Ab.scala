package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the q06b 5-way-star spellings over the bucketed layouts: the
  * pre-aggregate form trades the 60M-row fact flow through the
  * customer broadcast for a 15M-row per-partition SORT (HashAggregate
  * output loses the bucket sort, so the merge join re-sorts the
  * aggregated side); the join-then-agg form keeps both fact scans
  * sort-free (q65's shape) but pushes all 60M joined rows through the
  * broadcast probe and the final map-side aggregate.
  *
  * Usage: Q06Ab  (env SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
  */
object Q06Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Layout
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

    def cust = graft.Tables(spark, sfDir, "customer")
      .join(broadcast(graft.Tables(spark, sfDir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(graft.Tables(spark, sfDir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"), col("n_name"))
    def dsum(c: org.apache.spark.sql.Column) =
      graft.functions.ExactSumFunctions.sumScaled4(c.cast("double"))

    time("A: pre-agg then merge join") {
      val liAgg = li.groupBy(col("l_orderkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("rev"), count(lit(1)).as("n"))
      sink(orders.select(col("o_orderkey"), col("o_custkey"))
        .join(liAgg, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(col("rev")).as("revenue"), sum(col("n")).as("cnt")))
    }
    time("B: join-then-agg (q65 shape)") {
      sink(li.select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .join(orders.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"), count(lit(1)).as("cnt")))
    }
    spark.stop()
  }
}
