package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.{FunnelBuf, FunnelProg, Streams}

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

  test("stream-static enrichment join equals the batch join (stateless dim side)") {
    val stageDir = Files.createTempDirectory("stream-enrich").toString
    val events = Tables(spark, sfDir, "events")
    val customer = Tables(spark, sfDir, "customer")
    events.write.mode("overwrite").parquet(stageDir)
    val streamed = spark.readStream.schema(events.schema).parquet(stageDir)
    val q = Streams.enrichedWindowAgg(streamed, customer,
        col("c_custkey"), col("c_nationkey"))
      .writeStream.format("memory").queryName("enrich")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // doubles sum in partition order — compare the order-insensitive cols
    val got = spark.table("enrich")
      .select("bucket", "dim_val", "cnt").orderBy("bucket", "dim_val")
      .as[(java.sql.Timestamp, Long, Long)].collect().toSeq
    val want = Streams.enrichedWindowAgg(events, customer,
        col("c_custkey"), col("c_nationkey"))
      .select("bucket", "dim_val", "cnt").orderBy("bucket", "dim_val")
      .as[(java.sql.Timestamp, Long, Long)].collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
    // enrichment really happened: more than one nation bucket appears
    assert(got.map(_._2).distinct.size > 1)
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

  test("st03: multi-batch dropDuplicatesWithinWatermark == deterministic " +
       "anchor-chain batch face once the watermark passes an anchor's expiry") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(m: Long) = new java.sql.Timestamp((1440 + m) * 60000)
    // delay 10m. u1's anchor at t0 expires at t10; the batch-1 sentinel
    // pushes the watermark to t20 > t10, so u1's state is EVICTED and
    // t21 starts a new anchor — the exact semantics dedupAnchorChain
    // models (a kept anchor's expiry is firstTs + delay, duplicates do
    // not extend it).
    val evs = Seq(
      Streams.Event(1, ts(0), 1, "view", 0),
      Streams.Event(2, ts(5), 1, "view", 0),  // within 10m of anchor 1 → drop
      Streams.Event(3, ts(0), 2, "view", 0),
      Streams.Event(4, ts(21), 1, "view", 0), // past expiry → NEW anchor
      Streams.Event(5, ts(25), 1, "view", 0)) // within 10m of anchor 4 → drop
    val sentinel = Seq(Streams.Event(100, ts(30), 999, "w", 0)) // wm := t20
    val ms = MemoryStream[Streams.Event](
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Streams.Event](),
      spark.sqlContext)
    val q = Streams.dedupStream(ms.toDS().toDF(), Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup_face")
      .outputMode("append").start()
    Seq(evs.take(3) ++ sentinel, evs.drop(3)).foreach { b =>
      ms.addData(b); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("dedup_face").as[Streams.Event].collect()
      .filter(_.user_id != 999).map(_.event_id).sorted.toSeq
    val face = Streams.dedupAnchorChain(evs.toDS().toDF(),
        delayMs = 10 * 60 * 1000L)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(streamed === Seq(1L, 3L, 4L))
    assert(face === streamed)
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

  test("sessionize: sessions spanning microbatches are NOT split — " +
       "multi-batch streaming == single-batch streaming == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // offset from epoch 0: the stream's initial watermark is 0, and a
    // row at exactly the watermark is treated as late and dropped
    def ts(m: Long) = new java.sql.Timestamp((1440 + m) * 60000)
    val evs = Seq(
      Streams.Event(1, ts(0), 1, "view", 0), Streams.Event(2, ts(2), 1, "view", 0),
      Streams.Event(3, ts(4), 1, "click", 0),
      Streams.Event(4, ts(30), 1, "view", 0),  // new session (gap 26m)
      Streams.Event(5, ts(0), 2, "view", 0))
    // sentinels advance the watermark so event-time timeouts fire
    // (watermark updates at end of batch N, timeouts fire in N+1);
    // user 999 is excluded from the assertions
    val sent1 = Seq(Streams.Event(100, ts(10000), 999, "w", 0))
    val sent2 = Seq(Streams.Event(101, ts(20000), 999, "w", 0))

    def run(name: String, batches: Seq[Seq[Streams.Event]]): Seq[(Long, Int, Long, Long)] = {
      val ms = MemoryStream[Streams.Event](
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Streams.Event](),
        spark.sqlContext)
      val q = Streams.sessionize(ms.toDS(), gapMs = 5 * 60 * 1000)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[Streams.Session].collect().toSeq
        .filter(_.user_id != 999)
        .map(s => (s.user_id, s.n_events, s.start.getTime, s.end.getTime))
        .sortBy(x => (x._1, x._3))
    }

    // split mid-session: events 1-3 in batch 1, 4-5 in batch 2
    val multi = run("sess_multi", Seq(evs.take(3), evs.drop(3), sent1, sent2))
    val single = run("sess_single", Seq(evs, sent1, sent2))
    val batch = Streams.sessionize(evs.toDS(), gapMs = 5 * 60 * 1000)
      .collect().toSeq
      .map(s => (s.user_id, s.n_events, s.start.getTime, s.end.getTime))
      .sortBy(x => (x._1, x._3))

    val want = Seq(
      (1L, 3, ts(0).getTime, ts(4).getTime),
      (1L, 1, ts(30).getTime, ts(30).getTime),
      (2L, 1, ts(0).getTime, ts(0).getTime))
    assert(multi === want)
    assert(single === want)
    assert(batch === want)
  }

  test("funnelState: a late in-watermark view reorders before a buffered " +
       "click — multi-batch == single-batch == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(m: Long) = new java.sql.Timestamp((1440 + m) * 60000)
    def ev(u: Long, m: Long, tp: String) = Streams.FunnelEvent(u, ts(m), tp)
    // user 1: clean full funnel; user 2: click+purchase arrive FIRST,
    // the view that unlocks them arrives a batch later (late but inside
    // the 10-min lateness window); user 3: view only
    val b1 = Seq(ev(1, 0, "view"), ev(1, 4, "click"), ev(1, 8, "purchase"),
      ev(2, 2, "click"), ev(2, 3, "purchase"), ev(3, 5, "view"))
    val b2 = Seq(ev(2, 1, "view"))
    val sent1 = Seq(ev(999, 10000, "w"))
    val sent2 = Seq(ev(999, 20000, "w"))
    val evs = b1 ++ b2

    def run(name: String, batches: Seq[Seq[Streams.FunnelEvent]]) = {
      val ms = MemoryStream[Streams.FunnelEvent](
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Streams.FunnelEvent](),
        spark.sqlContext)
      val q = Streams.funnelState(ms.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      q.stop()
      val rows = spark.table(name).as[Streams.FunnelUpdate].collect().toSeq
        .filter(_.user_id != 999)
      // stages only advance, so the max-stage row per user is current
      rows.groupBy(_.user_id).values.map(_.maxBy(_.stage)).toSeq
        .map(u => (u.user_id, u.stage, u.t1.map(_.getTime),
          u.t2.map(_.getTime), u.t3.map(_.getTime)))
        .sortBy(_._1)
    }

    val want = Seq(
      (1L, 3, Some(ts(0).getTime), Some(ts(4).getTime), Some(ts(8).getTime)),
      (2L, 3, Some(ts(1).getTime), Some(ts(2).getTime), Some(ts(3).getTime)),
      (3L, 1, Some(ts(5).getTime), None, None))
    val multi = run("funnel_multi", Seq(b1, b2, sent1, sent2))
    val single = run("funnel_single", Seq(evs, sent1, sent2))
    val batch = Streams.funnelState(evs.toDS()).collect().toSeq
      .map(u => (u.user_id, u.stage, u.t1.map(_.getTime),
        u.t2.map(_.getTime), u.t3.map(_.getTime)))
      .sortBy(_._1)
    assert(multi === want)
    assert(single === want)
    assert(batch === want)
  }

  test("st07's gated WINDOW face equals the funnelState fold on the real " +
       "events table (round 16: the gated batch face is q50's window " +
       "spelling — zero fact Exchange — and this pin, with the " +
       "multi-batch == batch proofs above, keeps the DuckDB gate " +
       "adjudicating the same computation the stream performs)") {
    val winFace = SparkEntry.queries("st07_stream_funnel")(spark, sfDir)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1),
        Option(r.getTimestamp(2)).map(_.getTime),
        Option(r.getTimestamp(3)).map(_.getTime),
        Option(r.getTimestamp(4)).map(_.getTime)))
      .sortBy(_._1)
    val foldFace = Streams.funnelState(
        Tables(spark, sfDir, "events")
          .select(col("user_id"), date_trunc("second", col("ts")).as("ts"),
            col("event_type"))
          .as[Streams.FunnelEvent])
      .collect().toSeq
      .map(u => (u.user_id, u.stage, u.t1.map(_.getTime),
        u.t2.map(_.getTime), u.t3.map(_.getTime)))
      .sortBy(_._1)
    assert(winFace.size === foldFace.size)
    assert(winFace === foldFace)
  }

  test("sessionizeNative (session_window) equals explicit-state sessionize " +
       "on the real events table") {
    val base = Tables(spark, sfDir, "events")
      .select(col("event_id"), date_trunc("second", col("ts")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val gapMs = 60 * 60 * 1000L
    val custom = Streams.sessionize(base.as[Streams.Event], gapMs).collect().toSeq
      .map(s => (s.user_id, s.start.getTime, s.end.getTime, s.n_events.toLong))
      .sortBy(x => (x._1, x._2))
    val native = Streams.sessionizeNative(base, gap = "1 hour").collect().toSeq
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    assert(custom === native)
    assert(custom.nonEmpty)
  }

  test("sessionize: a late in-watermark event BRIDGES two gap-separated " +
       "fragments — nothing is emitted prematurely") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(m: Long) = new java.sql.Timestamp((1440 + m) * 60000)
    // gap 5m, lateness 10m: t0 and t6 don't merge; the late t3 (within
    // the watermark) arrives in batch 2 and joins them into ONE session
    val b1 = Seq(Streams.Event(1, ts(0), 1, "a", 0), Streams.Event(2, ts(6), 1, "b", 0))
    val b2 = Seq(Streams.Event(3, ts(3), 1, "late", 0))
    val sent1 = Seq(Streams.Event(100, ts(10000), 999, "w", 0))
    val sent2 = Seq(Streams.Event(101, ts(20000), 999, "w", 0))

    val ms = MemoryStream[Streams.Event](
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Streams.Event](),
      spark.sqlContext)
    val q = Streams.sessionize(ms.toDS(), gapMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("sessbridge").outputMode("append")
      .start()
    Seq(b1, b2, sent1, sent2).foreach { b => ms.addData(b); q.processAllAvailable() }
    q.stop()
    val got = spark.table("sessbridge").as[Streams.Session].collect().toSeq
      .filter(_.user_id != 999)
      .map(s => (s.user_id, s.n_events, s.start.getTime, s.end.getTime))
    assert(got === Seq((1L, 3, ts(0).getTime, ts(6).getTime)))
  }

  test("stream-stream interval join over microbatches equals the batch join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(m: Long) = new java.sql.Timestamp((1440 + m) * 60000)
    val evs = Seq(
      Streams.Event(1, ts(0), 1, "a", 0), Streams.Event(2, ts(3), 1, "b", 0),
      Streams.Event(3, ts(20), 1, "c", 0), // outside the 5-min window of 1/2
      Streams.Event(4, ts(1), 2, "d", 0), Streams.Event(5, ts(2), 2, "e", 0))
    val sentinel = Seq(Streams.Event(100, ts(10000), 999, "w", 0))

    val ms = MemoryStream[Streams.Event](
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Streams.Event](),
      spark.sqlContext)
    val q = Streams.intervalJoin(ms.toDF(), windowSec = 300)
      .writeStream.format("memory").queryName("ssjoin").outputMode("append")
      .start()
    // split so pairs span microbatches (events 1,4 then 2,3,5)
    Seq(evs.take(1) ++ evs.slice(3, 4), evs.slice(1, 3) ++ evs.slice(4, 5),
      sentinel, sentinel.map(e => e.copy(event_id = 101)))
      .foreach { b => ms.addData(b); q.processAllAvailable() }
    q.stop()

    def canon(rows: Seq[(Long, Long, Long)]) = rows.sorted
    val got = canon(spark.table("ssjoin").filter(col("user_id") =!= 999)
      .select("user_id", "id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSeq)
    val want = canon(Streams.intervalJoin(evs.toDF(), windowSec = 300)
      .select("user_id", "id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSeq)
    assert(got === want)
    assert(got === Seq((1L, 1L, 2L), (2L, 4L, 5L))) // event 3 out of window
  }

  test("streaming decontamination equals batch and stays stateless") {
    val docs = Tables(spark, sfDir, "documents")
    // build the eval-suite sketch once, in batch
    val mBits = 1 << 18
    val bits = docs.filter(col("doc_id") % 29 === 0)
      .select(explode(graft.operators.Dedup.shingleHashes(col("text"))).as("h"))
      .agg(graft.functions.BloomFunctions.bloomAgg(col("h"), mBits).as("b"))
      .as[Array[Byte]].head()

    val stageDir = Files.createTempDirectory("stream-decon").toString
    docs.write.mode("overwrite").parquet(stageDir)
    val streamed = spark.readStream.schema(docs.schema).parquet(stageDir)
    val q = Streams.decontaminateStream(streamed, "text", bits, mBits)
      .writeStream.format("memory").queryName("decon").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("decon")
      .select("doc_id", "n_shingles", "n_hits", "hit_milli")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val want = Streams.decontaminateStream(docs, "text", bits, mBits)
      .select("doc_id", "n_shingles", "n_hits", "hit_milli")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got === want)
    assert(got.nonEmpty)
    // ... and agrees with the batch operator (d09) on the flag set
    val d09 = graft.operators.Dedup.bloomContamination(
        docs, col("doc_id"), col("text"),
        docs.filter(col("doc_id") % 29 === 0), col("text"), mBits = mBits)
      .select("doc_id", "n_hits").as[(Long, Long)].collect().toSeq.sorted
    assert(got.map(r => (r._1, r._3)) === d09)
    // stateless: no microbatch registered a state-store operator
    assert(q.recentProgress.nonEmpty)
    assert(q.recentProgress.forall(_.stateOperators.isEmpty))
  }

  test("streaming mixture equals batch mixing and stays stateless") {
    val docs = Tables(spark, sfDir, "documents")
    // rates precomputed in batch on the seen corpus (st06's pattern)
    val rates = graft.operators.Mixing.mixtureCopies(docs, "source", col("text"))
      .select("source", "rate_ppm").distinct()
      .as[(String, Long)].collect().toMap

    val stageDir = Files.createTempDirectory("stream-mix").toString
    docs.write.mode("overwrite").parquet(stageDir)
    val streamed = spark.readStream.schema(docs.schema).parquet(stageDir)
    val q = Streams.mixtureStream(streamed, "source", "text", rates)
      .writeStream.format("memory").queryName("mixture").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("mixture")
      .select("doc_id", "copies").as[(Long, Long)].collect().toSeq.sorted
    val want = graft.operators.Mixing.mixtureCopies(docs, "source", col("text"))
      .filter(col("copies") > 0)
      .select("doc_id", "copies").as[(Long, Long)].collect().toSeq.sorted
    assert(got === want)
    assert(got.nonEmpty)
    // stateless: no microbatch registered a state-store operator
    assert(q.recentProgress.nonEmpty)
    assert(q.recentProgress.forall(_.stateOperators.isEmpty))
  }

  test("funnelSeal: stalled watermark — buffer holds exactly the above-" +
       "watermark events, folds nothing provisionally, drains as wm advances") {
    val empty = FunnelBuf(FunnelProg(None, None, None), Nil)
    // 40 events in adversarial (reversed, interleaved) arrival order,
    // all above the stalled watermark wm=0
    val ts = (1L to 40L)
    val evs = ts.map { t =>
      val tp = if (t % 10 == 1) "view" else if (t % 10 == 4) "click"
               else if (t % 10 == 7) "purchase" else "noise"
      (t * 60000L, tp)
    }
    val arrival = evs.reverse.grouped(7).toSeq // 6 stalled batches
    var st = empty
    var fed = 0
    arrival.foreach { batch =>
      st = Streams.funnelSeal(st, batch, wm = 0L)
      fed += batch.size
      // buffer == everything fed so far (all events are above wm);
      // nothing folded provisionally while the watermark stalls
      assert(st.buf.size === fed)
      assert(st.folded.stage === 0)
    }
    // advance the watermark stepwise: after each step the buffer holds
    // EXACTLY the still-above-watermark events (the lateness-window
    // bound), and sealed progress equals the clean in-order fold of
    // everything at-or-below wm
    Seq(5L, 11L, 23L, 40L).foreach { wmMin =>
      val wm = wmMin * 60000L
      st = Streams.funnelSeal(st, Nil, wm)
      assert(st.buf.size === evs.count(_._1 > wm))
      val want = evs.filter(_._1 <= wm).sortBy(_._1)
        .foldLeft(FunnelProg(None, None, None))((p, e) => p.fold(e._1, e._2))
      assert(st.folded === want)
    }
    assert(st.buf.isEmpty)
    assert(st.folded.stage === 3)
    // arrival order is irrelevant: the same events fed in one sorted
    // batch seal to the identical state
    assert(Streams.funnelSeal(empty, evs.sortBy(_._1), 40L * 60000L) === st)
  }

  test("funnelState adversarial: many keys buffer across a stalled " +
       "watermark, then each seals and times out exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val K = 40
    def ts(m: Long) = new java.sql.Timestamp((1440 + m) * 60000)
    def ev(u: Long, m: Long, tp: String) = Streams.FunnelEvent(u, ts(m), tp)
    // every key's funnel lives inside a 9-minute band < the 10-minute
    // lateness window, so while no later data arrives the watermark
    // (max ts - lateness) stays below ALL of it: every key holds its
    // whole funnel in the reorder buffer across batches
    val users = (1L to K.toLong)
    val b1 = users.flatMap(u => Seq(ev(u, (u % 5) + 2, "click"),
                                    ev(u, (u % 5) + 4, "purchase")))
    val b2 = users.map(u => ev(u, u % 5, "view")) // unlocking views, later batch
    val sent1 = Seq(ev(999, 10000, "w")) // advances the watermark
    val sent2 = Seq(ev(999, 20000, "w")) // batch in which timeouts fire
    val sent3 = Seq(ev(999, 30000, "w")) // must produce NO further rows

    val ms = MemoryStream[Streams.FunnelEvent](
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Streams.FunnelEvent](),
      spark.sqlContext)
    val q = Streams.funnelState(ms.toDS())
      .writeStream.format("memory").queryName("funnel_adv")
      .outputMode("append").start()
    def rows() = spark.table("funnel_adv").as[Streams.FunnelUpdate]
      .collect().toSeq.filter(_.user_id != 999)

    ms.addData(b1); q.processAllAvailable()
    ms.addData(b2); q.processAllAvailable()
    // stalled: every key has emitted only its first-sight stage-0 row —
    // nothing provisional leaked out of the buffers
    val stalled = rows()
    assert(stalled.size === K)
    assert(stalled.forall(_.stage === 0))

    ms.addData(sent1); q.processAllAvailable()
    ms.addData(sent2); q.processAllAvailable()
    val sealedRows = rows()
    ms.addData(sent3); q.processAllAvailable()
    val after = rows()
    q.stop()

    // each key sealed 0→3 in ONE timeout wakeup: exactly one advance
    // row per key beyond first sight, and the extra sentinel batch
    // re-fired nothing (the drained buffer cleared its timeout)
    assert(after.size === sealedRows.size)
    users.foreach { u =>
      val mine = after.filter(_.user_id == u)
      assert(mine.size === 2)
      assert(mine.map(_.stage).sorted === Seq(0, 3))
    }
    // and the sealed rows equal the batch face on the same events
    val batch = Streams.funnelState((b1 ++ b2).toDS()).collect().toSeq
      .map(u => (u.user_id, u.stage, u.t1.map(_.getTime),
        u.t2.map(_.getTime), u.t3.map(_.getTime))).sortBy(_._1)
    val live = after.groupBy(_.user_id).values.map(_.maxBy(_.stage)).toSeq
      .map(u => (u.user_id, u.stage, u.t1.map(_.getTime),
        u.t2.map(_.getTime), u.t3.map(_.getTime))).sortBy(_._1)
    assert(live === batch)
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

  test("asofState: a late dim claims a buffered fact; equal-ts dim applies; " +
       "multi-batch == single-batch == batch, each fact exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(m: Long) = new java.sql.Timestamp((1440 + m) * 60000)
    def dim(k: Long, m: Long, id: Long, v: Double) =
      Streams.AsofEvent(k, ts(m), "d", id, v)
    def fact(k: Long, m: Long, id: Long) =
      Streams.AsofEvent(k, ts(m), "f", id, 0.0)
    // key 1: fact at t5 arrives FIRST; the dim at t3 that should match
    // it arrives a batch later (late but inside the lateness window) —
    // a naive "match on arrival" join would emit (fact@5, dim@1).
    // key 2: dim shares the fact's exact timestamp (asof >= applies it)
    // and a second equal-ts dim with higher id wins (arg_max rule).
    // key 3: fact before any dim → null match.
    val b1 = Seq(dim(1, 1, 10, 1.0), fact(1, 5, 11),
      dim(2, 4, 20, 5.0), fact(3, 2, 30))
    val b2 = Seq(dim(1, 3, 12, 3.0), fact(2, 4, 21), dim(2, 4, 22, 7.0))
    val sent1 = Seq(fact(999, 10000, 990))
    val sent2 = Seq(fact(999, 20000, 991))
    val evs = b1 ++ b2

    def run(name: String, batches: Seq[Seq[Streams.AsofEvent]]) = {
      val ms = MemoryStream[Streams.AsofEvent](
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Streams.AsofEvent](),
        spark.sqlContext)
      val q = Streams.asofState(ms.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[Streams.AsofOut].collect().toSeq
        .filter(_.key != 999)
        .map(o => (o.key, o.fact_id, o.fact_ts.getTime,
          o.dim_ts.map(_.getTime), o.dim_value))
        .sortBy(x => (x._1, x._2))
    }

    val want = Seq(
      (1L, 11L, ts(5).getTime, Some(ts(3).getTime), Some(3.0)),
      (2L, 21L, ts(4).getTime, Some(ts(4).getTime), Some(7.0)),
      (3L, 30L, ts(2).getTime, None, None))
    val multi = run("asof_multi", Seq(b1, b2, sent1, sent2))
    val single = run("asof_single", Seq(evs, sent1, sent2))
    val batch = Streams.asofState(evs.toDS()).collect().toSeq
      .map(o => (o.key, o.fact_id, o.fact_ts.getTime,
        o.dim_ts.map(_.getTime), o.dim_value))
      .sortBy(x => (x._1, x._2))
    // exactly-once: one output row per fact, no retractions/duplicates
    assert(multi === want)
    assert(single === want)
    assert(batch === want)
  }

  test("asofSeal: buffer holds exactly the above-watermark rows; sealed " +
       "dims collapse to one triple under a stalled watermark") {
    val e0 = graft.streaming.AsofBuf(None, 0L, 0.0, Nil)
    // watermark stalled at 100: everything above buffers, nothing emits
    val rows = (1 to 40).map(i => (100L + i, if (i % 2 == 0) "d" else "f",
      i.toLong, i * 1.0))
    val (s1, out1) = Streams.asofSeal(e0, rows, wm = 100L)
    assert(out1.isEmpty)
    assert(s1.buf.size === 40 && s1.dimTs.isEmpty)
    // watermark jumps past all: every fact emits once, dims collapse
    // to the single latest triple (ts=140, id=40, v=40.0)
    val (s2, out2) = Streams.asofSeal(s1, Nil, wm = 1000L)
    assert(s2.buf.isEmpty)
    assert(out2.size === 20)
    assert(s2.dimTs === Some(140L) && s2.dimId === 40L && s2.dimVal === 40.0)
    // a fact between two dims matched the dim below it, not above
    val f103 = out2.find(_.fact_id == 3L).get
    assert(f103.dim_ts.map(_.getTime) === Some(102L) && f103.dim_value === Some(2.0))
  }

  test("streaming curation (st10) equals its batch face, drops all " +
      "seen content, and stays stateless") {
    val docs = Tables(spark, sfDir, "documents")
    // the batch pipeline has already admitted the even-id half
    val seen = docs.filter(col("doc_id") % 2 === 0)
    val bloom = Streams.seenFingerprintBloom(seen, "text")

    val stageDir = Files.createTempDirectory("stream-cur").toString
    docs.write.mode("overwrite").parquet(stageDir)
    val streamed = spark.readStream.schema(docs.schema).parquet(stageDir)
    val q = Streams.curationStream(streamed, "text", bloom)
      .select("doc_id", "quality_bp", "n_tokens", "split")
      .writeStream.format("memory").queryName("curation").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("curation")
      .as[(Long, Long, Long, String)].collect().toSeq.sorted
    val want = Streams.curationStream(docs, "text", bloom)
      .select("doc_id", "quality_bp", "n_tokens", "split")
      .as[(Long, Long, Long, String)].collect().toSeq.sorted
    assert(got === want)
    assert(got.nonEmpty)
    // conservative in the safe direction: no already-seen doc is ever
    // re-admitted (Bloom has no false negatives); some UNSEEN docs
    // must survive (the sketch is not degenerately full)
    val seenIds = seen.select("doc_id").as[Long].collect().toSet
    assert(got.forall(r => !seenIds.contains(r._1)))
    assert(got.exists(r => r._1 % 2 === 1L))
    // the row-local columns agree with the gated batch formulas
    import graft.operators.TextAnalysis
    val formulas = docs
      .select(col("doc_id"), TextAnalysis.qualityScoreBp(col("text")).as("q"),
        TextAnalysis.tokenCount(col("text")).as("n"),
        pmod(TextAnalysis.fingerprint(col("text")), lit(100L)).as("b"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    got.foreach { case (id, qbp, n, split) =>
      val (_, fq, fn, fb) = formulas(id)
      assert(qbp === fq && n === fn && qbp >= 5500L)
      val fsplit = if (fb < 90) "train" else if (fb < 95) "val" else "test"
      assert(split === fsplit)
    }
    // stateless: no microbatch registered a state-store operator
    assert(q.recentProgress.nonEmpty)
    assert(q.recentProgress.forall(_.stateOperators.isEmpty))
  }

  test("streaming sliding distinct (st11) finalizes exactly q61's " +
      "window counts through the chained dedup->agg state") {
    val events = Tables(spark, sfDir, "events").select("user_id", "ts")
    // a far-future sentinel pushes the watermark past every real
    // window so append mode finalizes them all
    val maxTs = events.agg(max(col("ts"))).as[java.sql.Timestamp].head()
    val sentinel = Seq((-1L, new java.sql.Timestamp(
      maxTs.getTime + 2 * 3600 * 1000))).toDF("user_id", "ts")
    val staged = events.unionByName(sentinel)
    val stageDir = Files.createTempDirectory("stream-sd").toString
    staged.write.mode("overwrite").parquet(stageDir)

    val streamed = spark.readStream.schema(staged.schema).parquet(stageDir)
    val q = Streams.slidingDistinctStream(streamed)
      .writeStream.format("memory").queryName("sliding").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // real windows only (the sentinel's 6 windows are 2h past them)
    val maxRealW = maxTs.getTime / 1000 / 600 * 600
    val got = spark.table("sliding")
      .select((col("w_ts").cast("long")).as("w_start"), col("n_users"))
      .filter(col("w_start") <= maxRealW)
      .as[(Long, Long)].collect().toSeq.sorted
    // q61's batch formulation over the same events
    val want = events
      .select(col("user_id"), expr("unix_timestamp(ts) div 600").as("b"))
      .distinct()
      .select(col("user_id"), col("b"),
        explode(expr("sequence(0, 5)")).as("i"))
      .select(col("user_id"), ((col("b") - col("i")) * 600).as("w_start"))
      .distinct()
      .groupBy("w_start").agg(count(lit(1)).as("n_users"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got === want)
    assert(got.nonEmpty)
    // the chain really is two stateful operators (dedup + agg)
    assert(q.recentProgress.nonEmpty)
    assert(q.recentProgress.exists(_.stateOperators.length === 2))
  }

  test("checkpoint recovery (st11): the chained dedup→agg state " +
      "survives a restart — a duplicate (user, window) delivered to " +
      "the RESTARTED stream is not double-counted, and windows " +
      "finalize exactly once") {
    val stageDir = Files.createTempDirectory("sd-ck-stage").toString
    val ckpt = Files.createTempDirectory("sd-ck-state").toString
    val out = collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val schema = new org.apache.spark.sql.types.StructType()
      .add("user_id", "long").add("ts", "timestamp")
    def run(): Unit = {
      val streamed = spark.readStream.schema(schema).parquet(stageDir)
      val q = Streams.slidingDistinctStream(streamed)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.select(col("w_ts").cast("long"), col("n_users"))
            .as[(Long, Long)].collect()
          out.synchronized { out ++= rows }; ()
        }
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 01:00:00")
    def at(u: Long, offSec: Long) =
      (u, new java.sql.Timestamp(t0.getTime + offSec * 1000))
    // run 1: two users in ONE bucket — the checkpointed watermark ends
    // at t0 − 600 (w_ts trails by the fan-out), leaving the two newest
    // windows OPEN with (u1, w) dedup entries in state
    Seq(at(1L, 0), at(2L, 0)).toDF("user_id", "ts")
      .coalesce(1).write.mode("append").parquet(stageDir)
    run()
    // run 2 on the SAME checkpoint: user 1's event REDELIVERED
    // verbatim — its two ABOVE-WATERMARK windows are suppressed ONLY
    // if the dedup state recovered (a fresh store would re-emit them
    // into the agg and double-count); user 3 contributes to exactly
    // those two windows (its older fan-out rows are legitimately
    // late); the far-future sentinel finalizes every real window
    Seq(at(1L, 0), at(3L, 0), at(-1L, 4 * 3600)).toDF("user_id", "ts")
      .coalesce(1).write.mode("append").parquet(stageDir)
    run()
    val b0 = t0.getTime / 1000 / 600 * 600
    val got = out.synchronized(out.toList)
      .filter(_._1 <= b0).sorted
    // window t0: {u1, u2} + u3 with the duplicate suppressed → 3;
    // older windows: {u1, u2} only — u3's fan-out rows at or below
    // the recovered watermark (boundary INCLUSIVE, measured) are
    // late-dropped, which is itself recovery evidence: a fresh
    // checkpoint would have watermark 0 and admit all six
    val want = (0 to 5).map { i =>
      (b0 - 600L * i, if (i == 0) 3L else 2L)
    }.sorted
    assert(got === want)
    // exactly-once: no window appeared twice across the two runs
    assert(got.map(_._1).distinct.size === got.size)
  }

  test("checkpoint recovery: a RESTARTED dedup stream remembers every " +
      "key the killed run already emitted") {
    // fault-tolerance, not just multi-batch equivalence: run 1
    // processes half the corpus and terminates; run 2 is a NEW query
    // over the same checkpoint seeing the other half. If the state
    // store did not recover, run 2 would re-emit keys run 1 already
    // deduped.
    val events = Tables(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val stageDir = Files.createTempDirectory("ckpt-stage").toString
    val ckpt = Files.createTempDirectory("ckpt-state").toString
    val a = events.filter(col("event_id") % 2 === 0)
    val b = events.filter(col("event_id") % 2 =!= 0)

    // the memory sink refuses checkpoint recovery; the parquet sink is
    // the surface a real pipeline restarts on anyway
    val outDir = Files.createTempDirectory("ckpt-out").toString
    def run(): Set[Long] = {
      val streamed = spark.readStream.schema(events.schema).parquet(stageDir)
      // lateness far beyond the corpus span: no state eviction, no
      // late-row drops — isolates the recovery property
      val q = Streams.dedupStream(streamed, Seq("user_id"),
          lateness = "3650 days")
        .writeStream.format("parquet").outputMode("append")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      spark.read.parquet(outDir).select("user_id").as[Long].collect().toSet
    }

    a.coalesce(1).write.mode("append").parquet(stageDir)
    val got1 = run()
    b.coalesce(1).write.mode("append").parquet(stageDir)
    val gotAll = run()

    // the union is exactly the batch-distinct key set...
    val want = events.select("user_id").distinct().as[Long].collect().toSet
    assert(got1.nonEmpty && gotAll === want)
    // ...and EXACTLY-ONCE across the restart: one sink ROW per key —
    // a lost state store would re-emit run-1 keys seen again in run 2
    val sinkRows = spark.read.parquet(outDir).count()
    assert(sinkRows === want.size.toLong,
      s"$sinkRows sink rows for ${want.size} keys — state re-emitted")
  }

  test("checkpoint recovery (st07): the funnel's REORDER BUFFER survives " +
      "a kill — a late view delivered after two restarts still unlocks " +
      "stages buffered before the first kill, exactly once") {
    // harder than st03's key-set recovery: the state here is not a seen
    // flag but the un-sealed event buffer plus sealed per-user progress.
    // run 1 buffers user 1's full funnel and user 2's click+purchase
    // under a stalled watermark and dies; run 2 (new query, same
    // checkpoint) delivers user 2's EARLIER view plus a watermark
    // sentinel; run 3 delivers a later sentinel so the event-time
    // timers fire. If any buffered event were lost in either restart,
    // user 1 could not reach stage 3 and user 2's funnel could not
    // unlock.
    def ts(m: Long) = new java.sql.Timestamp((1440 + m) * 60000)
    def ev(u: Long, m: Long, tp: String) = Streams.FunnelEvent(u, ts(m), tp)
    val b1 = Seq(ev(1, 0, "view"), ev(1, 4, "click"), ev(1, 8, "purchase"),
      ev(2, 2, "click"), ev(2, 3, "purchase"), ev(3, 5, "view"))
    val b2 = Seq(ev(2, 1, "view"))
    val sent1 = Seq(ev(999, 10000, "w"))
    val sent2 = Seq(ev(999, 20000, "w"))

    val stageDir = Files.createTempDirectory("funnel-ckpt-stage").toString
    val ckpt = Files.createTempDirectory("funnel-ckpt-state").toString
    val outDir = Files.createTempDirectory("funnel-ckpt-out").toString
    def run(): Unit = {
      val streamed = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Streams.FunnelEvent]].schema)
        .parquet(stageDir).as[Streams.FunnelEvent]
      val q = Streams.funnelState(streamed)
        .writeStream.format("parquet").outputMode("append")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    b1.toDS().coalesce(1).write.mode("append").parquet(stageDir)
    run()
    (b2 ++ sent1).toDS().coalesce(1).write.mode("append").parquet(stageDir)
    run()
    sent2.toDS().coalesce(1).write.mode("append").parquet(stageDir)
    run()

    val rows = spark.read.parquet(outDir).as[Streams.FunnelUpdate]
      .collect().toSeq.filter(_.user_id != 999)
    val got = rows.groupBy(_.user_id).values.map(_.maxBy(_.stage)).toSeq
      .map(u => (u.user_id, u.stage, u.t1.map(_.getTime),
        u.t2.map(_.getTime), u.t3.map(_.getTime)))
      .sortBy(_._1)
    val want = Streams.funnelState((b1 ++ b2).toDS()).collect().toSeq
      .map(u => (u.user_id, u.stage, u.t1.map(_.getTime),
        u.t2.map(_.getTime), u.t3.map(_.getTime)))
      .sortBy(_._1)
    assert(got === want)
    assert(got.exists(_._2 === 3)) // the cross-restart full funnel
    // exactly-once: stages only advance, so no (user, stage) repeats —
    // a lost/replayed state would re-emit earlier stages
    val emissions = rows.map(u => (u.user_id, u.stage))
    assert(emissions.distinct.size === emissions.size,
      s"duplicate stage emissions across restarts: $emissions")
  }

  test("checkpoint recovery (st09): a fact buffered before the kill " +
      "joins a dim delivered after it — each fact emits exactly once") {
    def ts(m: Long) = new java.sql.Timestamp((1440 + m) * 60000)
    // key 1: dim then fact, both in run 1 (pure buffer survival);
    // key 2: the fact arrives in run 1, its as-of dim arrives EARLIER
    // in event time but LATER in arrival time — across the restart
    val b1 = Seq(
      Streams.AsofEvent(1L, ts(0), "d", 10L, 10.0),
      Streams.AsofEvent(1L, ts(5), "f", 100L, 0.0),
      Streams.AsofEvent(2L, ts(3), "f", 200L, 0.0))
    val b2 = Seq(Streams.AsofEvent(2L, ts(1), "d", 20L, 20.0))
    val sent1 = Seq(Streams.AsofEvent(999L, ts(10000), "d", 0L, 0.0))
    val sent2 = Seq(Streams.AsofEvent(999L, ts(20000), "d", 0L, 0.0))

    val stageDir = Files.createTempDirectory("asof-ckpt-stage").toString
    val ckpt = Files.createTempDirectory("asof-ckpt-state").toString
    val outDir = Files.createTempDirectory("asof-ckpt-out").toString
    def run(): Unit = {
      val streamed = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Streams.AsofEvent]].schema)
        .parquet(stageDir).as[Streams.AsofEvent]
      val q = Streams.asofState(streamed)
        .writeStream.format("parquet").outputMode("append")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    b1.toDS().coalesce(1).write.mode("append").parquet(stageDir)
    run()
    (b2 ++ sent1).toDS().coalesce(1).write.mode("append").parquet(stageDir)
    run()
    sent2.toDS().coalesce(1).write.mode("append").parquet(stageDir)
    run()

    val rows = spark.read.parquet(outDir).as[Streams.AsofOut]
      .collect().toSeq.filter(_.key != 999L)
    val got = rows
      .map(o => (o.key, o.fact_id, o.fact_ts.getTime,
        o.dim_ts.map(_.getTime), o.dim_value))
      .sortBy(_._2)
    val want = Streams.asofState((b1 ++ b2).toDS()).collect().toSeq
      .map(o => (o.key, o.fact_id, o.fact_ts.getTime,
        o.dim_ts.map(_.getTime), o.dim_value))
      .sortBy(_._2)
    assert(got === want)
    // the cross-restart reorder really happened: fact 200 carries the
    // dim that arrived after it, two restarts later
    assert(got.exists(o => o._2 === 200L && o._5 === Some(20.0)))
    // exactly-once: one emission per fact across all three runs
    assert(rows.map(_.fact_id).distinct.size === rows.size,
      s"fact re-emitted across restarts: ${rows.map(_.fact_id)}")
  }

  test("checkpoint recovery (st16): the 100-value RING BUFFER and its " +
      "exact running sums survive a kill — an event sealed after the " +
      "restart scores against a baseline mostly accumulated before it, " +
      "and a reorder-buffered row delivered late still seals in event-" +
      "time order, each alert exactly once") {
    // one type, 115 events at 1/minute; v has a sawtooth texture plus
    // two spikes — one sealed pre-kill (m=103), one post-restart
    // (m=112) whose 100-row frame spans the restart. m=110 is WITHHELD
    // in run 1 (still above the run-1 watermark of ts(104)) and
    // delivered in run 2: if the reorder buffer or the ring state were
    // lost, seal order or the m=112 baseline would be wrong.
    def ts(m: Long) = new java.sql.Timestamp((1440 + m) * 60000)
    def v(m: Long): Double =
      if (m == 103 || m == 112) 25.0 else 10.0 + (m % 7) * 0.5
    def ev(m: Long) = Streams.AnomEvent("a", ts(m), m, v(m))
    val all = (0L to 114L).map(ev)
    val b1 = all.filterNot(_.event_id == 110L)
    val b2 = Seq(ev(110))
    val sent = Seq(Streams.AnomEvent("zz", ts(20000), 999L, 0.0))

    val stageDir = Files.createTempDirectory("anom-ckpt-stage").toString
    val ckpt = Files.createTempDirectory("anom-ckpt-state").toString
    val outDir = Files.createTempDirectory("anom-ckpt-out").toString
    def run(): Unit = {
      val streamed = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Streams.AnomEvent]].schema)
        .parquet(stageDir).as[Streams.AnomEvent]
      val q = Streams.anomalyState(streamed)
        .writeStream.format("parquet").outputMode("append")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    b1.toDS().coalesce(1).write.mode("append").parquet(stageDir)
    run()
    (b2 ++ sent).toDS().coalesce(1).write.mode("append").parquet(stageDir)
    run()

    val rows = spark.read.parquet(outDir).as[Streams.AnomAlert]
      .collect().toSeq.filter(_.event_type == "a")
    val want = Streams.anomalyState(all.toDS()).collect().toSeq
      .map(a => (a.event_type, a.event_id, a.value)).sorted
    assert(rows.map(a => (a.event_type, a.event_id, a.value)).sorted
      === want)
    // both spikes alert: m=103 sealed pre-kill, m=112 post-restart —
    // the latter's frame is the recovered ring buffer
    assert(rows.exists(_.event_id === 103L))
    assert(rows.exists(_.event_id === 112L))
    // exactly-once across the restart
    assert(rows.map(_.event_id).distinct.size === rows.size,
      s"alert re-emitted across restarts: ${rows.map(_.event_id)}")
  }

  test("streaming join-size estimate (st12) converges to the batch " +
      "sketch estimate through the state-store aggregate") {
    import graft.functions.CmsFunctions
    val depth = 3; val width = 8192
    val events = Tables(spark, sfDir, "events")
      .select(when(col("event_id") % 3 === 0, lit(1L))
        .otherwise(col("user_id")).as("k"))
    val orders = Tables(spark, sfDir, "orders")
      .select(when(col("o_orderkey") % 997 < 3, lit(1L))
        .otherwise(col("o_custkey")).as("k"))
    val ocms = orders
      .agg(CmsFunctions.cmsAgg(col("k"), depth, width))
      .head().getAs[Array[Byte]](0)
    // batch face == q64's estimate over the same sides
    val want = Streams.joinSizeStream(events, col("k"), ocms, depth, width)
      .as[Long].head()

    val stageDir = Files.createTempDirectory("stream-js").toString
    events.write.mode("overwrite").parquet(stageDir)
    val streamed = spark.readStream.schema(events.schema).parquet(stageDir)
    val q = Streams.joinSizeStream(streamed, col("k"), ocms, depth, width)
      .writeStream.format("memory").queryName("joinsize")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("joinsize").as[Long].head()
    assert(got === want)
    assert(got > 0L)
    // the estimate is a real stateful aggregate, not a recomputation
    assert(q.recentProgress.nonEmpty)
    assert(q.recentProgress.exists(_.stateOperators.nonEmpty))
  }

  test("st13 upsertState: LWW on seq across microbatches — stale " +
       "updates ignored, tombstones block resurrection, updates " +
       "after a delete revive; final state == batch face == " +
       "Diff.applyChangeset") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val b1 = Seq(
      Streams.ChangeRow(1L, 1L, "insert", 10.0),
      Streams.ChangeRow(2L, 1L, "insert", 20.0),
      Streams.ChangeRow(3L, 1L, "insert", 30.0))
    val b2 = Seq(
      Streams.ChangeRow(1L, 3L, "update", 11.0),
      Streams.ChangeRow(2L, 2L, "delete", 0.0),
      Streams.ChangeRow(4L, 1L, "update", 40.0)) // update-on-absent inserts
    val b3 = Seq(
      Streams.ChangeRow(1L, 2L, "update", 999.0), // STALE: < seq 3, ignored
      Streams.ChangeRow(2L, 1L, "update", 888.0), // STALE vs tombstone seq 2
      Streams.ChangeRow(3L, 4L, "update", 31.0),
      Streams.ChangeRow(2L, 5L, "update", 21.0))  // after-delete revive
    val ms = MemoryStream[Streams.ChangeRow](
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Streams.ChangeRow](),
      spark.sqlContext)
    val q = Streams.upsertState(ms.toDS())
      .writeStream.format("memory").queryName("upsert13")
      .outputMode("update").start()
    Seq(b1, b2, b3).foreach { b => ms.addData(b); q.processAllAvailable() }
    assert(q.recentProgress.exists(_.stateOperators.nonEmpty))
    q.stop()
    // last emission per key is the materialized current version
    val lastPerKey = spark.table("upsert13").as[Streams.UpsertOut].collect()
      .groupBy(_.key).map { case (k, vs) => vs.maxBy(_.seq) }
      .toSeq.sortBy(_.key)
    val want = Seq(
      Streams.UpsertOut(1L, 3L, true, 11.0),
      Streams.UpsertOut(2L, 5L, true, 21.0),
      Streams.UpsertOut(3L, 4L, true, 31.0),
      Streams.UpsertOut(4L, 1L, true, 40.0))
    assert(lastPerKey === want)
    // batch face: same fold in one pass over the union
    val all = (b1 ++ b2 ++ b3).toDS()
    val face = Streams.upsertState(all).collect().toSeq.sortBy(_.key)
    assert(face === want)
    // and q68's operator agrees on the live set (empty snapshot +
    // the whole changelog with seq resolution)
    val snap = Seq.empty[(Long, Double)].toDF("key", "value")
    val chg = all.select(col("key"), col("value"), col("op"), col("seq"))
    val applied = graft.operators.Diff.applyChangeset(snap, chg,
        keys = Seq("key"), seqCol = Some("seq"))
      .as[(Long, Double)].collect().toSeq.sortBy(_._1)
    assert(applied === want.filter(_.live).map(o => (o.key, o.value)))
  }

  test("checkpoint recovery (st13): the LWW seq survives a restart — " +
      "a stale change delivered to the RESTARTED stream is still " +
      "rejected by the recovered register") {
    // the recovery property that matters for a merge: if the state
    // store were lost, run 2's stale seq-2 update would hit a fresh
    // register (seq = MinValue) and APPLY — silently corrupting the
    // materialization with a value run 1 had already superseded.
    val stageDir = Files.createTempDirectory("ups-stage").toString
    val ckpt = Files.createTempDirectory("ups-ckpt").toString
    val out = collection.mutable.ArrayBuffer.empty[Streams.UpsertOut]
    def run(): Unit = {
      val streamed = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Streams.ChangeRow]].schema)
        .parquet(stageDir).as[Streams.ChangeRow]
      // update-mode changelog → foreachBatch (file sinks are
      // append-only); the buffer only collects, idempotence is the
      // operator's job
      val q = Streams.upsertState(streamed)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Streams.UpsertOut],
                         _: Long) =>
          out.synchronized { out ++= df.collect() }; ()
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    Seq(Streams.ChangeRow(1L, 3L, "insert", 11.0),
        Streams.ChangeRow(2L, 1L, "insert", 20.0))
      .toDS().coalesce(1).write.mode("append").parquet(stageDir)
    run()
    val afterRun1 = out.synchronized(out.toList)
    assert(afterRun1.toSet === Set(
      Streams.UpsertOut(1L, 3L, true, 11.0),
      Streams.UpsertOut(2L, 1L, true, 20.0)))
    Seq(Streams.ChangeRow(1L, 2L, "update", 999.0), // STALE vs recovered seq 3
        Streams.ChangeRow(2L, 2L, "delete", 0.0),
        Streams.ChangeRow(3L, 1L, "insert", 30.0))
      .toDS().coalesce(1).write.mode("append").parquet(stageDir)
    run()
    val run2 = out.synchronized(out.toList).drop(afterRun1.size)
      .groupBy(_.key).map { case (_, vs) => vs.last }.toSeq.sortBy(_.key)
    assert(run2 === Seq(
      Streams.UpsertOut(1L, 3L, true, 11.0),   // stale 999 rejected
      Streams.UpsertOut(2L, 2L, false, 0.0),   // tombstone emitted
      Streams.UpsertOut(3L, 1L, true, 30.0)))
  }

  test("st13 upsertState: equal-seq redelivery is idempotent (the " +
       "arrival-order-insensitive reading), unknown ops fail loudly") {
    // redelivery of the applied change: seq ties resolve to the
    // FIRST-SORTED application and the replica is ignored — the state
    // converges to the same row whichever copy a partition saw first
    val redeliver = Seq(
      Streams.ChangeRow(7L, 5L, "update", 1.0),
      Streams.ChangeRow(7L, 5L, "update", 1.0)).toDS()
    val out = Streams.upsertState(redeliver).collect().toSeq
    assert(out === Seq(Streams.UpsertOut(7L, 5L, true, 1.0)))
    val typo = Seq(Streams.ChangeRow(7L, 5L, "upsert", 1.0)).toDS()
    val e = intercept[Exception] { Streams.upsertState(typo).collect() }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + msgs(t.getCause)
    assert(msgs(e).contains("unknown op"), e.toString)
  }

  test("st15 rangeChecksumStream: streamed per-range digests equal the " +
      "batch rangeDigest over the table the changelog materializes " +
      "(LWW fold inside range state; tombstones hold)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val b1 = Seq(
      Streams.ChangeRow(1L, 1L, "insert", 10.0),    // range 0
      Streams.ChangeRow(65L, 1L, "insert", 20.0),   // range 1
      Streams.ChangeRow(130L, 1L, "insert", 30.0))  // range 2
    val b2 = Seq(
      Streams.ChangeRow(1L, 3L, "update", 11.0),
      Streams.ChangeRow(65L, 2L, "delete", 0.0))
    val b3 = Seq(
      Streams.ChangeRow(66L, 1L, "insert", 21.5),
      Streams.ChangeRow(65L, 1L, "update", 99.0))   // stale vs tombstone
    val ms = MemoryStream[Streams.ChangeRow](
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Streams.ChangeRow](),
      spark.sqlContext)
    val q = Streams.rangeChecksumStream(ms.toDS(), rangeSize = 64L)
      .writeStream.format("memory").queryName("chk15")
      .outputMode("update").start()
    Seq(b1, b2, b3).foreach { b => ms.addData(b); q.processAllAvailable() }
    assert(q.recentProgress.exists(_.stateOperators.nonEmpty))
    q.stop()
    // the gauge: LAST emission per range is its current digest
    val streamed = spark.table("chk15").as[Streams.RangeDigestOut]
      .collect().zipWithIndex
      .groupBy(_._1.range_id).map { case (_, vs) => vs.maxBy(_._2)._1 }
      .toSet
    // batch face of the SAME machinery on one Dataset
    val all = (b1 ++ b2 ++ b3).toDS()
    val batchFace = Streams.rangeChecksumStream(all, 64L).collect().toSet
    // the table the changelog materializes (upsertState's live rows),
    // digested by q72's batch operator with the same column rendering
    val live = Streams.upsertState(all).filter(_.live)
      .map(u => (u.key, u.value)).toDF("k", "v")
    val batchDigest = graft.operators.Diff.rangeDigest(live, col("k"), 64L,
        Seq(col("k").cast("string"), col("v").cast("string")))
      .select("range_id", "n_rows", "xor64", "sum31")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => Streams.RangeDigestOut(t._1, t._2, t._3, t._4)).toSet
    assert(streamed === batchDigest)
    assert(batchFace === batchDigest)
    // sanity on the fixture: three live rows, one per range
    assert(batchDigest.map(_.range_id) === Set(0L, 1L, 2L))
    assert(batchDigest.forall(_.n_rows == 1L))
  }

  test("st14 scd2Stream: closed versions emitted as newer changes seal " +
      "them — multi-batch stream == one-batch fold == the closed " +
      "(is_current = false) rows of Diff.scd2History") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val b1 = Seq(
      Streams.ChangeRow(1L, 1L, "insert", 10.0),
      Streams.ChangeRow(2L, 1L, "insert", 20.0))
    val b2 = Seq(
      Streams.ChangeRow(1L, 3L, "update", 11.0),  // closes key1 [1, 3)
      Streams.ChangeRow(2L, 2L, "delete", 0.0))   // closes key2 [1, 2), gap
    val b3 = Seq(
      Streams.ChangeRow(2L, 5L, "insert", 21.0))  // re-opens key2 — no emit
    val ms = MemoryStream[Streams.ChangeRow](
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Streams.ChangeRow](),
      spark.sqlContext)
    val q = Streams.scd2Stream(ms.toDS())
      .writeStream.format("memory").queryName("scd14")
      .outputMode("append").start()
    Seq(b1, b2, b3).foreach { b => ms.addData(b); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("scd14").as[Streams.Scd2Closed]
      .collect().toSet
    val want = Set(
      Streams.Scd2Closed(1L, 1L, 3L, 10.0),
      Streams.Scd2Closed(2L, 1L, 2L, 20.0))
    assert(streamed === want)
    // one-batch fold == the stream
    val all = (b1 ++ b2 ++ b3).toDS()
    assert(Streams.scd2Stream(all).collect().toSet === want)
    // == q70's operator on the same changelog, closed rows only
    val asDf = all.toDF("k", "seq", "op", "v")
    val batchClosed = graft.operators.Diff.scd2History(asDf, keys = Seq("k"))
      .filter(!col("is_current"))
      .select("k", "valid_from", "valid_to", "v")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(batchClosed ===
      want.map(c => (c.key, c.valid_from, c.valid_to, c.value)))
  }

  test("checkpoint recovery (st15): the per-range ROW MAP survives a " +
      "restart — the digest emitted by the restarted stream still " +
      "covers run 1's rows, and a stale change is still rejected by " +
      "the recovered per-key seq") {
    // the recovery property for anti-entropy: a digest computed over
    // lost state would silently cover only post-restart keys and a
    // replica compare would flag a phantom divergence (or worse, a
    // stale update would apply and the digests would AGREE on corrupt
    // data). Post-restart digests must equal the batch face over the
    // full changelog.
    val stageDir = Files.createTempDirectory("chk-stage").toString
    val ckpt = Files.createTempDirectory("chk-ckpt").toString
    val out = collection.mutable.ArrayBuffer.empty[Streams.RangeDigestOut]
    def run(): Unit = {
      val streamed = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Streams.ChangeRow]].schema)
        .parquet(stageDir).as[Streams.ChangeRow]
      val q = Streams.rangeChecksumStream(streamed, rangeSize = 64L)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Streams.RangeDigestOut],
                         _: Long) =>
          out.synchronized { out ++= df.collect() }; ()
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    val b1 = Seq(
      Streams.ChangeRow(1L, 3L, "insert", 10.0),   // range 0
      Streams.ChangeRow(2L, 1L, "insert", 20.0),   // range 0
      Streams.ChangeRow(65L, 1L, "insert", 30.0))  // range 1
    b1.toDS().coalesce(1).write.mode("append").parquet(stageDir)
    run()
    val afterRun1 = out.synchronized(out.size)
    // kill-and-restart: run 2 sees a stale change for key 1 (seq 2 <
    // recovered 3) and a fresh insert into range 0
    val b2 = Seq(
      Streams.ChangeRow(1L, 2L, "update", 999.0), // STALE vs recovered 3
      Streams.ChangeRow(3L, 1L, "insert", 40.0))  // range 0
    b2.toDS().coalesce(1).write.mode("append").parquet(stageDir)
    run()
    val run2 = out.synchronized(out.toList).drop(afterRun1)
      .groupBy(_.range_id).map { case (_, vs) => vs.last }.toSet
    // batch face of the same machinery over the FULL changelog: the
    // restarted digest for range 0 must cover keys 1, 2 AND 3 with
    // key 1 still at value 10.0 — only possible if the row map and
    // its seqs were recovered from the checkpoint
    val batchFace = Streams.rangeChecksumStream((b1 ++ b2).toDS(), 64L)
      .collect().filter(d => run2.exists(_.range_id == d.range_id)).toSet
    assert(run2 === batchFace)
    assert(run2.find(_.range_id === 0L).get.n_rows === 3L)
  }

  test("checkpoint recovery (st14): the OPEN version survives a " +
      "restart — the closure emitted by the restarted stream carries " +
      "run 1's valid_from, and a stale change is still rejected") {
    val stageDir = Files.createTempDirectory("scd-stage").toString
    val ckpt = Files.createTempDirectory("scd-ckpt").toString
    val out = collection.mutable.ArrayBuffer.empty[Streams.Scd2Closed]
    def run(): Unit = {
      val streamed = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Streams.ChangeRow]].schema)
        .parquet(stageDir).as[Streams.ChangeRow]
      val q = Streams.scd2Stream(streamed)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Streams.Scd2Closed],
                         _: Long) =>
          out.synchronized { out ++= df.collect() }; ()
        }
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    Seq(Streams.ChangeRow(1L, 3L, "insert", 11.0))
      .toDS().coalesce(1).write.mode("append").parquet(stageDir)
    run()
    assert(out.synchronized(out.toList).isEmpty) // nothing closed yet
    Seq(Streams.ChangeRow(1L, 2L, "update", 999.0), // STALE vs recovered 3
        Streams.ChangeRow(1L, 7L, "update", 12.0))  // closes [3, 7)
      .toDS().coalesce(1).write.mode("append").parquet(stageDir)
    run()
    // had the state been lost, the stale seq-2 row would have opened a
    // phantom version and the emission would read [2, 7) value 999
    assert(out.synchronized(out.toList) ===
      List(Streams.Scd2Closed(1L, 3L, 7L, 11.0)))
  }

  test("st13 upsertState: DISTINCT same-seq changes within one batch " +
       "resolve by the (seq, op, value) total order, not arrival " +
       "order — the winner is identical under reversed input") {
    // two different updates and a delete, all at seq 5: a stable
    // sort on seq alone would crown whichever arrived first in
    // shuffle-iteration order — replay-unstable. The total order
    // sorts "delete" < "update" and lower value first, so the delete
    // wins deterministically whatever the input permutation.
    val changes = Seq(
      Streams.ChangeRow(9L, 5L, "update", 2.0),
      Streams.ChangeRow(9L, 5L, "delete", 0.0),
      Streams.ChangeRow(9L, 5L, "update", 1.0))
    val fwd = Streams.upsertState(changes.toDS()).collect().toSeq
    val rev = Streams.upsertState(changes.reverse.toDS()).collect().toSeq
    assert(fwd === rev)
    assert(fwd === Seq(Streams.UpsertOut(9L, 5L, live = false, 0.0)))
    // same-seq updates only: the lower (op, value) pair wins
    val uu = Seq(
      Streams.ChangeRow(8L, 5L, "update", 2.0),
      Streams.ChangeRow(8L, 5L, "update", 1.0))
    assert(Streams.upsertState(uu.toDS()).collect().toSeq ===
      Streams.upsertState(uu.reverse.toDS()).collect().toSeq)
    assert(Streams.upsertState(uu.toDS()).collect().toSeq ===
      Seq(Streams.UpsertOut(8L, 5L, live = true, 1.0)))
  }
}
