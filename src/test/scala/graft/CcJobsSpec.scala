package graft

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import graft.operators.Dedup

/** Locks in the one-blocking-action-per-round property of connected
  * components: the convergence signal is computed inside the round's
  * own aggregation action, not by a separate join action. (AQE splits
  * one action into several stage-materialization JOBS — that's query
  * scheduling, not extra driver round-trips — so the spec counts
  * executed actions, not jobs.) */
class CcJobsSpec extends TestSpark {
  import spark.implicits._

  test("connected components: one action per propagation round") {
    // path 1-2-3-4 has diameter 3 → 3 changing rounds + 1 confirming
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val actions = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = actions.add(funcName)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val got = Dedup.connectedComponents(pairs).as[(Long, Long)]
        .collect().toMap
      assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
      // listener events are delivered asynchronously; drain the bus
      // instead of a capped polled sleep (which can elapse on a
      // steal-stalled host before delivery, failing spuriously)
      org.apache.spark.sql.GraftInternal.waitForListeners(spark)
    } finally spark.listenerManager.unregister(listener)
    // localCheckpoint registrations fire the listener too (1 eager for
    // edges + 1 lazy per round) but only the EAGER one runs a job; the
    // driver round-trips that execute work are the per-round
    // convergence counts and the final collect. A regression to a
    // separate convergence action would add 4 more entries here.
    import scala.jdk.CollectionConverters._
    val byName = actions.asScala.toSeq.groupBy(identity)
      .view.mapValues(_.size).toMap
    val nonCheckpoint = actions.asScala.count(_ != "localCheckpoint")
    assert(nonCheckpoint === 5,
      s"connected components executed $nonCheckpoint non-checkpoint " +
        s"actions for a 4-round run; expected 5 (4 round counts + " +
        s"1 collect). Breakdown: $byName")
    assert(byName.getOrElse("localCheckpoint", 0) === 5) // 1 edges + 4 rounds
  }
}
