package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Scratch decomposition of q03's cost: scan-only vs double-sum vs
  * decimal-sum vs decimal-cast-only. */
object AbQ03 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata_sf10")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val D4 = DecimalType(27, 4)
    def g = li.groupBy("l_returnflag", "l_linestatus")
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "scan_count" -> (() => g.agg(count(lit(1)).as("n"))),
      "sum_double1" -> (() => g.agg(sum(col("l_quantity")).as("a"), count(lit(1)).as("n"))),
      "sum_double4" -> (() => g.agg(sum(col("l_quantity")).as("a"),
        sum(col("l_extendedprice")).as("b"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("c"),
        avg(col("l_quantity")).as("d"), count(lit(1)).as("n"))),
      "sum_dec1" -> (() => g.agg(sum(col("l_quantity").cast(D4)).cast(DoubleType).as("a"), count(lit(1)).as("n"))),
      "sum_dec4" -> (() => g.agg(sum(col("l_quantity").cast(D4)).cast(DoubleType).as("a"),
        sum(col("l_extendedprice").cast(D4)).cast(DoubleType).as("b"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(D4)).cast(DoubleType).as("c"),
        (sum(col("l_quantity").cast(D4)).cast(DoubleType) / count(lit(1))).as("d"),
        count(lit(1)).as("n"))),
      "sum_long4" -> (() => g.agg(sum((col("l_quantity") * 10000).cast("long")).as("a"),
        sum((col("l_extendedprice") * 10000).cast("long")).as("b"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000).cast("long")).as("c"),
        avg((col("l_quantity") * 10000).cast("long")).as("d"), count(lit(1)).as("n")))
    )
    for ((nm, f) <- variants) // warm
      f().write.format("noop").mode("overwrite").save()
    for (i <- 1 to 3; (nm, f) <- variants) {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      println(f"$nm pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
