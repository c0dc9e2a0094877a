package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.Streams

class StreamingSpec extends TestSpark {
  import spark.implicits._

  test("streamed windowed agg equals the batch windowed agg") {
    // stage events as a file-source stream (one parquet dir)
    val stageDir = Files.createTempDirectory("stream-src").toString
    val events = Tables(spark, sfDir, "events")
    events.write.mode("overwrite").parquet(stageDir)

    val streamed = spark.readStream
      .schema(events.schema)
      .parquet(stageDir)
    val q = Streams.windowedAgg(streamed)
      .writeStream.format("memory").queryName("winagg")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("winagg")
      .select("bucket", "event_type", "cnt")
      .orderBy("bucket", "event_type")
      .as[(java.sql.Timestamp, String, Long)].collect().toSeq
    val want = Streams.windowedAgg(events)
      .select("bucket", "event_type", "cnt")
      .orderBy("bucket", "event_type")
      .as[(java.sql.Timestamp, String, Long)].collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    val stageDir = Files.createTempDirectory("stream-dedup").toString
    val events = Tables(spark, sfDir, "events")
    // duplicate the whole table → every event_id appears twice
    events.unionAll(events).write.mode("overwrite").parquet(stageDir)
    val streamed = spark.readStream.schema(events.schema).parquet(stageDir)
    val q = Streams.dedupStream(streamed, Seq("event_id"))
      .writeStream.format("memory").queryName("dedupst")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.table("dedupst").count() === events.count())
  }

  test("sessionize groups events by inactivity gap") {
    def ts(m: Long) = new java.sql.Timestamp(m * 60000)
    val events = Seq(
      Streams.Event(1, ts(0), 1, "view", 0), Streams.Event(2, ts(2), 1, "view", 0),
      Streams.Event(3, ts(4), 1, "click", 0),
      Streams.Event(4, ts(30), 1, "view", 0),       // new session (gap 26m)
      Streams.Event(5, ts(0), 2, "view", 0)
    ).toDS()
    val sessions = Streams.sessionize(events, gapMs = 5 * 60 * 1000)
      .collect().sortBy(s => (s.user_id, s.start.getTime))
    assert(sessions.map(s => (s.user_id, s.n_events)).toSeq ===
      Seq((1L, 3), (1L, 1), (2L, 1)))
  }

  test("sessionize on the real events table produces bounded sane sessions") {
    val events = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Streams.Event]
    val sessions = Streams.sessionize(events, gapMs = 60 * 60 * 1000).collect()
    assert(sessions.nonEmpty)
    assert(sessions.forall(s => s.n_events > 0 && !s.end.before(s.start)))
    // every event lands in exactly one session
    assert(sessions.map(_.n_events.toLong).sum === events.count())
  }
}
