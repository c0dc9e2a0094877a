package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object T78 {
  def main(a: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    val d = sys.env("SPARK_GRAFT_SF_DIR")
    val li = spark.read.parquet(d + "/lineitem.parquet")
    val D4 = org.apache.spark.sql.types.DecimalType(27,4)
    val w = col("l_quantity").cast(D4)
    val bucket = floor(col("l_extendedprice") / 1000.0).cast("long")
    def litphase = {
      val cells = li.groupBy(col("l_returnflag").as("g"), bucket.as("b")).agg(sum(w).as("bw"))
      val cumB = Window.partitionBy("g").orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bounds = cells.withColumn("cum", sum("bw").over(cumB))
        .withColumn("tot", sum("bw").over(Window.partitionBy("g")))
        .filter(col("cum") * 2 >= col("tot"))
        .groupBy("g").agg(min_by(struct(col("b"), (col("cum")-col("bw")).as("below"), col("tot")), col("b")).as("m"))
        .select(col("g"), col("m.b").as("mb"), col("m.below").as("below"), col("m.tot").as("tot"))
        .collect()
      val mbM = map(bounds.toSeq.flatMap(r => Seq(lit(r.getString(0)), lit(r.getLong(1)))): _*)
      val belM = map(bounds.toSeq.flatMap(r => Seq(lit(r.getString(0)), lit(r.getDecimal(2)))): _*)
      val totM = map(bounds.toSeq.flatMap(r => Seq(lit(r.getString(0)), lit(r.getDecimal(3)))): _*)
      val cumV = Window.partitionBy("g").orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li.select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"), col("l_quantity").as("q"))
        .filter(floor(col("v") / 1000.0).cast("long") === element_at(mbM, col("g")))
        .groupBy("g", "v").agg(sum(col("q").cast(D4)).as("vw"))
        .withColumn("cumv", sum("vw").over(cumV))
        .filter((element_at(belM, col("g")) + col("cumv")) * 2 >= element_at(totM, col("g")))
        .groupBy("g").agg(min("v").as("wmedian")).orderBy("g")
    }
    def run(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime(); f.collect(); (System.nanoTime()-t0)/1e9
    }
    run(litphase)
    val ts = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 5) ts += run(litphase)
    println(f"litphase:${ts.map(x=>f"$x%.2f").mkString(",")}  min=${ts.min}%.2f")
    println(litphase.collect().mkString(" | "))
    spark.stop()
  }
}
