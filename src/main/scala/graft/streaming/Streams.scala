package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events schema
  * (event_id, ts, user_id, event_type, value).
  *
  * Batch/stream parity by construction: the same transformation
  * function is applied to a `readStream` DataFrame as to a batch one,
  * so the windowed aggregation is testable against its batch result.
  */
object Streams {

  /** Tumbling-window count+sum per event_type with a watermark —
    * late data beyond 10 minutes is dropped, bounding state. */
  def windowedAgg(events: DataFrame,
                  windowimdur: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), windowimdur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Streaming exact dedup on a key with bounded state: watermark on
    * the event time lets Spark drop per-key state once the key can no
    * longer recur within the lateness bound — the streaming counterpart
    * of Dedup.exact. Works identically on a batch DataFrame. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  lateness: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class Session(user_id: Long, n_events: Int,
                           start: Timestamp, end: Timestamp)
  private final case class SessionState(n: Int, start: Long, last: Long)

  /** Gap-based sessionization with explicit state: a session closes
    * after `gapMs` of inactivity (processing-time timeout on streams).
    * State per key is O(1) — counts and boundaries only. */
  def sessionize(events: Dataset[Event], gapMs: Long = 5 * 60 * 1000): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          // batch mode: all events for the key arrive at once, sorted here
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          val out = scala.collection.mutable.ArrayBuffer[Session]()
          var cur: Option[SessionState] = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.last <= gapMs =>
                cur = Some(s.copy(n = s.n + 1, last = t))
              case Some(s) =>
                out += Session(uid, s.n, new Timestamp(s.start), new Timestamp(s.last))
                cur = Some(SessionState(1, t, t))
              case None =>
                cur = Some(SessionState(1, t, t))
            }
          }
          // close the trailing session in batch mode; a stream would
          // keep it in state until the timeout fires
          cur.foreach(s => out += Session(uid, s.n, new Timestamp(s.start), new Timestamp(s.last)))
          state.remove()
          out.iterator
      }
  }
}
