package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution

/** Dev tool: run EVERY headline query once (noop sink) in one session
  * and print, per query, the operator histogram of its FINAL adaptive
  * write plan — SortMergeJoin / ShuffledHashJoin / BroadcastHashJoin /
  * Exchange / Sort / Window / CartesianProduct counts plus wall time —
  * so remaining structural fat (a surprise sort-merge join, an extra
  * exchange) is visible across the whole suite in one run instead of
  * one ShowPlan JVM per query.
  *
  * Caveats: multi-action operators (CC rounds, Lloyd steps, collected
  * models) only expose their LAST action's plan here; per-query times
  * are single-sample and include cache effects — use graft.Bench for
  * timing, this for plan shape.
  *
  * usage: PlanScan [onlyCsv] ; env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS. */
object PlanScan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only: Option[Set[String]] =
      args.headOption.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var lastQe: QueryExecution = null
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = lastQe = qe
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    })
    val run = graft.Bench.headline.filter(q => only.forall(_.contains(q)))
    println(f"${"query"}%-28s ${"s"}%6s  SMJ SHJ BHJ BNLJ Exch Sort Wind Cart")
    run.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      lastQe = null
      val t0 = System.nanoTime()
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch { case e: Throwable =>
        System.err.println(s"[planscan] $name FAILED: ${e.getMessage}"); false
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // drain the async listener bus until the capture settles
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var settled = false
      while (!settled && System.nanoTime() < deadline) {
        val seen = lastQe; Thread.sleep(200)
        settled = seen != null && (seen eq lastQe)
      }
      if (ok && lastQe != null) {
        val s = lastQe.executedPlan.toString
        def c(p: String) = p.r.findAllIn(s).size
        println(f"$name%-28s $dt%6.2f  ${c("SortMergeJoin")}%3d ${c("ShuffledHashJoin")}%3d " +
          f"${c("BroadcastHashJoin")}%3d ${c("BroadcastNestedLoopJoin")}%4d ${c("Exchange")}%4d " +
          f"${c("\\bSort\\b")}%4d ${c("\\bWindow\\b")}%4d ${c("CartesianProduct")}%4d")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
