package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-by-stage timing of q81's passes: where do the ~4.6 s at sf10
  * go — the driver stat scans (ranges / chunk stats / tails), the
  * main window pass, or the report aggregate?
  *
  * Usage: Q81Ab  (env SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
  */
object Q81Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val ev = graft.Tables(spark, sfDir, "events")
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
    ev.write.format("noop").mode("overwrite").save() // warm cache
    val v4 = col("value").cast(graft.queries.D4)
    val vv4 = (col("value") * col("value")).cast(graft.queries.D4)
    val tsl = unix_micros(col("ts"))

    time("ranges (min/max per type)") {
      ev.groupBy("event_type").agg(min(tsl), max(tsl)).collect()
    }
    val nChunks = 64
    val lo = lit(0.0); // fake bounds: timing only
    val chunk = least(greatest(width_bucket(tsl.cast("double"),
      lit(1.5768E15), lit(1.5906E15), lit(nChunks)), lit(1L)),
      lit(nChunks.toLong)).cast("int")
    time("chunk stats (count/sums)") {
      ev.groupBy(col("event_type"), chunk.as("c"))
        .agg(count(lit(1)), sum(v4), sum(vv4)).collect()
    }
    time("tails (WindowGroupLimit?)") {
      val wDesc = Window.partitionBy(col("event_type"), col("c"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val df = ev.withColumn("c", chunk)
        .withColumn("__rd", row_number().over(wDesc))
        .filter(col("__rd") <= 101)
        .select(col("event_type"), col("c"))
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("WindowGroupLimit") || l.contains("Exchange"))
        .mkString("\n"))
      df.collect().length
    }
    time("main window pass (noop)") {
      val wOrd = Window.partitionBy(col("event_type"), col("c"))
        .orderBy(col("ts"), col("event_id"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("c", chunk)
        .select(col("event_type"), col("ts"), col("event_id"), col("value"),
          col("c"))
        .select(col("event_type"), col("ts"), col("event_id"),
          col("value"), col("c"),
          row_number().over(wOrd).as("rn"),
          sum(v4).over(wRun).as("cum"),
          sum(vv4).over(wRun).as("cumq"))
        .withColumn("lc", lag(col("cum"), 101).over(wOrd))
        .write.format("noop").mode("overwrite").save()
    }
    time("full gated q81") {
      graft.SparkEntry.queries("q81_rolling_anomaly")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
