package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: runs one SparkEntry query N times against
  * the noop sink and prints every sample plus the median, so per-query
  * regressions can be separated from hypervisor steal-time noise.
  *
  * Usage: BenchOne <queryName> [iters] [conf=k:v ...]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: BenchOne <queryName> [iters] [conf=key:value ...]")
      sys.exit(2)
    }
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var b = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
    args.drop(2).filter(_.startsWith("conf=")).foreach { a =>
      a.stripPrefix("conf=").split(":", 2) match {
        case Array(k, v) => b = b.config(k, v)
        case _ =>
          System.err.println(s"malformed '$a' — expected conf=key:value")
          sys.exit(2)
      }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    // codegen warm-up at the smallest SF
    try fn(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    spark.catalog.clearCache()
    val samples = (1 to iters).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    val med = samples.sorted.apply(samples.size / 2)
    println(f"$name samples=${samples.map(s => f"$s%.2f").mkString(",")} median=$med%.3f")
    spark.stop()
  }
}
