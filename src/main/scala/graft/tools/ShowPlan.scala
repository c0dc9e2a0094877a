package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution

/** Dev tool: execute one `SparkEntry.queries` entry against the noop
  * sink and print its FINAL adaptive physical plan — the plan-audit
  * loop ("is this the plan I'd want at 100 TB?") as a one-liner.
  *
  * The noop write runs its OWN QueryExecution (the one `df.write`
  * builds around the plan), so printing `df.queryExecution` after the
  * save would show an un-executed AdaptiveSparkPlan (initial plan,
  * pre-AQE join strategies — misleading: AQE's broadcast conversions
  * and coalescing never appear). A QueryExecutionListener captures the
  * write's actual QueryExecution instead, whose executedPlan is the
  * final adaptive plan after the run.
  *
  * usage: ShowPlan <queryName> [fmt=formatted] [conf=key:value ...]
  * `fmt=formatted` prints explain("formatted") — the numbered-operator
  * view committed as plan artifacts under plans/.
  * env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS. */
object ShowPlan {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: ShowPlan <queryName> [fmt=formatted] [conf=key:value ...]")
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
        case _ =>
          System.err.println(s"malformed '$a' — expected conf=key:value")
          sys.exit(2)
      }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // capture the noop write's QueryExecution: the LAST successful one
    // (multi-job operators — CC rounds, Lloyd steps — fire earlier
    // onSuccess events for their internal actions; the write is final)
    @volatile var writeQe: QueryExecution = null
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = writeQe = qe
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    })
    val df = graft.SparkEntry.queries(args(0))(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    // the listener bus is async — poll until the capture stops
    // changing (internal actions' events drain first, the write's is
    // posted last; listenerBus.waitUntilEmpty is private[spark])
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var settled = false
    while (!settled && System.nanoTime() < deadline) {
      val seen = writeQe
      Thread.sleep(500)
      settled = seen != null && (seen eq writeQe)
    }
    val qe = if (writeQe != null) writeQe else df.queryExecution
    if (args.contains("fmt=formatted"))
      println(qe.explainString(org.apache.spark.sql.execution.FormattedMode))
    else println(qe.executedPlan.toString)
    spark.stop()
  }
}
