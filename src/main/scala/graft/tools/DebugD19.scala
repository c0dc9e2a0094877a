package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only d19 stage timer: variants / raw candidates / verified /
  * distinct counts with wall times, to localize the sf1 cost. */
object DebugD19 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata_sf1")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sup = graft.Tables(spark, sfDir, "supplier")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  -> $r")
      r
    }
    val base = sup.select(col("s_suppkey").as("id"), col("s_name").as("s"))
    val vars = base.select(col("id"), col("s"),
      explode(array_distinct(concat(array(col("s")),
        expr("transform(sequence(1, length(s)), " +
          "i -> concat(substr(s, 1, i-1), substr(s, i+1)))")))).as("v"))
    timed("variants count")(vars.count())
    val j = vars.as("a").join(vars.as("b"),
      col("a.v") === col("b.v") && col("a.id") < col("b.id"))
    timed("raw candidate rows")(j.count())
    val v2 = j.select(col("a.id").as("id_a"), col("b.id").as("id_b"),
      levenshtein(col("a.s"), col("b.s")).as("dist"))
      .filter(col("dist") <= 1)
    timed("verified rows")(v2.count())
    timed("distinct pairs")(v2.distinct().count())
    spark.stop()
  }
}
