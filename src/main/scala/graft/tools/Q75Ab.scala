package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B: q75 one-pass multi-distinct (Expand 4x) vs a union of three
  * single-column profile branches (each column-pruned to ONE parquet
  * column, single-distinct rewrite — no Expand; the three branches are
  * independent stages the scheduler overlaps). */
object Q75Ab {
  def main(a: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env("SPARK_GRAFT_SF_DIR")
    val li = spark.read.parquet(d + "/lineitem.parquet")

    def unionVariant: DataFrame = {
      def prof(c: String) = li.agg(
        count(lit(1)).as("n_rows"),
        count(when(col(c).isNull, 1)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).as("min_v"),
        max(col(c)).as("max_v"),
        graft.queries.dsum(col(c)).as("sum_v"))
        .select(lit(c).as("col_name"), col("*"))
      prof("l_quantity").unionAll(prof("l_extendedprice"))
        .unionAll(prof("l_discount")).orderBy("col_name")
    }
    def run(f: => DataFrame): Double = {
      val t0 = System.nanoTime(); f.collect(); (System.nanoTime() - t0) / 1e9
    }
    run(unionVariant) // warm
    val cur = (1 to 4).map(_ =>
      run(graft.SparkEntry.queries("q75_column_profile")(spark, d)))
    val uni = (1 to 4).map(_ => run(unionVariant))
    println(f"expand : ${cur.map(x => f"$x%.2f").mkString(",")} min=${cur.min}%.2f")
    println(f"union3 : ${uni.map(x => f"$x%.2f").mkString(",")} min=${uni.min}%.2f")
    println(unionVariant.collect().mkString(" | "))
    spark.stop()
  }
}
