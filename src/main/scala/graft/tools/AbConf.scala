package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: INTERLEAVED same-JVM A/B of a runtime SQLConf on one
  * query — sample A, sample B, sample A, ... — so a host steal wave
  * (this VM: 4-20% in bursts of minutes) lands on both arms instead of
  * poisoning whichever arm ran in its window (which made one
  * sequential d07 SMJ-vs-SHJ comparison read 29.9 s vs 3.7 s when the
  * quiet-window truth was 2.5 vs 3.1 the OTHER way).
  *
  * usage: AbConf <query> <confKey> <valA> <valB> [pairs]
  * env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS. */
object AbConf {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println("usage: AbConf <query> <confKey> <valA> <valB> [pairs]")
      sys.exit(2)
    }
    val Array(name, key, va, vb) = args.take(4)
    val pairs = if (args.length > 4) args(4).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    // codegen warm-up at the smallest SF, once per arm (different conf
    // can mean structurally different generated code)
    Seq(va, vb).foreach { v =>
      spark.conf.set(key, v)
      try fn(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    def clean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    clean()
    val times = collection.mutable.Map("A" -> Vector.empty[Double],
                                       "B" -> Vector.empty[Double])
    for (_ <- 1 to pairs; (arm, v) <- Seq("A" -> va, "B" -> vb)) {
      spark.conf.set(key, v)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      times(arm) :+= (System.nanoTime() - t0) / 1e9
      clean()
    }
    def stat(arm: String, v: String): Unit = {
      val t = times(arm)
      val med = t.sorted.apply(t.size / 2)
      println(f"$arm ($key=$v): median $med%6.3f  min ${t.min}%6.3f  " +
        s"(${t.map(x => f"$x%.2f").mkString(", ")})")
    }
    stat("A", va); stat("B", vb)
    spark.stop()
  }
}
