package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for q22's exact-distinct spellings at a given SF:
  * (a) scan floor (count(*) only), (b) the generic two-level
  * count-distinct rewrite, (c) the BitmapDistinct aggregate. 5 timed
  * samples each after one warm-up; prints all samples + medians.
  * Measurements cited in the Q("q22_count_distinct") comment. */
object AbQ22 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "scan_floor" -> (() => orders.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))),
      "generic" -> (() => orders.groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))),
      "bitmap" -> (() => orders.groupBy("o_orderstatus")
        .agg(graft.functions.BitmapFunctions.bitmapDistinct(col("o_custkey"))
          .as("n_cust"), count(lit(1)).as("n_orders"))))
    variants.foreach { case (name, mk) =>
      mk().write.format("noop").mode("overwrite").save() // warm-up
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(ts.length / 2)
      println(f"$name%-10s samples=${ts.map(t => f"$t%.2f").mkString(",")} median=$med%.3f")
    }
    spark.stop()
  }
}
