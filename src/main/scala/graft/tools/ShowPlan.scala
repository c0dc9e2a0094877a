package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: execute one `SparkEntry.queries` entry against the noop
  * sink and print its FINAL adaptive physical plan — the plan-audit
  * loop ("is this the plan I'd want at 100 TB?") as a one-liner.
  *
  * usage: ShowPlan <queryName> [conf=key:value ...]
  * env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS. */
object ShowPlan {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: ShowPlan <queryName> [conf=key:value ...]")
      sys.exit(2)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var b = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
    args.drop(1).filter(_.startsWith("conf=")).foreach { a =>
      a.stripPrefix("conf=").split(":", 2) match {
        case Array(k, v) => b = b.config(k, v)
        case _           =>
      }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    // executedPlan AFTER the action = isFinalPlan=true under AQE
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
