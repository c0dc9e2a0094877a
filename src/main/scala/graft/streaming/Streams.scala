package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open-session accumulator for [[Streams.sessionize]] — top-level and
  * public because the streaming state store compiles an encoder for it
  * on executors (count + boundaries only: O(1) per key). */
final case class SessionState(n: Int, start: Long, last: Long)

/** Per-key state for [[Streams.sessionize]]: the still-bridgeable
  * session fragments, oldest first. Bounded: a fragment leaves state as
  * soon as the watermark passes `last + gap` (no accepted event can
  * bridge it anymore), so at most ~lateness/gap fragments live per key. */
final case class SessionFrags(frags: Seq[SessionState])

/** Watermark-FINAL funnel progress for [[Streams.funnelState]]: the
  * strict-order step minima folded from events the watermark has
  * already sealed. O(1) per user, forever — three optional longs. */
final case class FunnelProg(t1: Option[Long], t2: Option[Long],
                            t3: Option[Long]) {
  def stage: Int =
    if (t3.isDefined) 3 else if (t2.isDefined) 2
    else if (t1.isDefined) 1 else 0
  /** One in-event-time-order fold step. Strict `>` everywhere, so a
    * click sharing t1's exact timestamp never counts as "after" it —
    * the same tie rule as q50's `ts > t1` window condition. */
  def fold(ts: Long, tp: String): FunnelProg = tp match {
    case "view" if t1.isEmpty => copy(t1 = Some(ts))
    case "click" if t2.isEmpty && t1.exists(ts > _) => copy(t2 = Some(ts))
    case "purchase" if t3.isEmpty && t2.exists(ts > _) => copy(t3 = Some(ts))
    case _ => this
  }
}

/** Per-user state for [[Streams.funnelState]]: sealed progress plus the
  * reorder buffer of (ts, type) events still at-or-above the watermark
  * — a late-but-in-watermark view can still precede them, so they
  * cannot be folded yet. Bounded by the lateness window. */
final case class FunnelBuf(folded: FunnelProg, buf: Seq[(Long, String)])

/** Per-key state for [[Streams.asofState]]: the LATEST sealed dimension
  * row (sealed dims collapse — an as-of probe can only ever match the
  * most recent one at or below its timestamp), plus the reorder buffer
  * of (ts, side, id, value) rows the watermark has not sealed.
  * `dimTs = None` means no dim sealed yet; then dimId/dimVal are
  * meaningless placeholders (encoders reject Option-less nulls more
  * cheaply than Option[Double] boxes per row). O(1) + lateness-window
  * state per key. */
final case class AsofBuf(dimTs: Option[Long], dimId: Long, dimVal: Double,
                         buf: Seq[(Long, String, Long, Double)])

/** Per-key state for [[Streams.upsertState]]: the LWW register —
  * highest seq applied, liveness (false = tombstone), value. */
final case class UpsertSt(seq: Long, live: Boolean, value: Double)

/** Structured Streaming operators over the events schema
  * (event_id, ts, user_id, event_type, value).
  *
  * Batch/stream parity by construction: the same transformation
  * function is applied to a `readStream` DataFrame as to a batch one,
  * so the windowed aggregation is testable against its batch result.
  */
object Streams {

  /** Exact deterministic double sum — the batch queries' `dsum`
    * (128-bit scaled-long accumulation, see
    * [[graft.functions.SumScaled4]]): COMMUTATIVE AND EXACT, so the
    * result is bit-identical under any partitioning, microbatch
    * split, or engine (the DuckDB oracle spells the equivalent
    * decimal cast) — where a plain double sum varies in the last ulp
    * with reduction order. In streaming the (hi, lo, seen) buffer is
    * the state-store row: fixed-width primitives, and merging a new
    * microbatch's partials into stored state is the same carry
    * arithmetic as a shuffle merge. */
  private def dsum(c: Column): Column = graft.queries.dsum(c)

  /** Tumbling-window count+sum per event_type with a watermark —
    * late data beyond 10 minutes is dropped, bounding state. */
  def windowedAgg(events: DataFrame,
                  windowimdur: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), windowimdur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Stream-static enrichment: join a stream of events to a static
    * dimension table and aggregate per window × dimension attribute —
    * the standard streaming-ETL enrichment shape. The stream-static
    * join is STATELESS in Structured Streaming (each microbatch joins
    * against the static frame; no state store grows), and broadcasting
    * the dim keeps the stream side shuffle-free before the windowed
    * agg — whose watermark bounds the only state there is. Works
    * identically on a batch DataFrame.
    *
    * The stream side is parameterized like the dim side: `streamKey`
    * joins against `dimKey`, `tsCol` must be a timestamp (the
    * watermark and window run on it), `valCol` is summed. Defaults
    * match the events schema (user_id, ts, value). */
  def enrichedWindowAgg(events: DataFrame, dim: DataFrame,
                        dimKey: Column, dimVal: Column,
                        winDur: String = "1 hour",
                        streamKey: String = "user_id",
                        tsCol: String = "ts",
                        valCol: String = "value"): DataFrame =
    events.withWatermark(tsCol, "10 minutes")
      .join(broadcast(dim.select(dimKey.as(streamKey), dimVal.as("dim_val"))),
        streamKey)
      .groupBy(window(col(tsCol), winDur).as("w"), col("dim_val"))
      .agg(count(lit(1)).as("cnt"), dsum(col(valCol)).as("sum_value"))
      .select(col("w.start").as("bucket"), col("dim_val"),
        col("cnt"), col("sum_value"))

  /** Streaming decontamination — the stream face of
    * [[graft.operators.Dedup.bloomContamination]]: each arriving doc is
    * checked ROW-LOCALLY against a precomputed Bloom bit array of the
    * benchmark suite's shingle hashes. Completely STATELESS — no state
    * store, no watermark, no shuffle: the sketch is a binary literal
    * riding the plan (at cluster scale, a broadcast variable), and a
    * microbatch is a narrow map + filter. This is the ingest-guard
    * shape: the eval-suite sketch is built once in batch
    * (`bloom_sketch` over the bench shingles), then every arriving
    * corpus shard is screened before it ever lands.
    *
    * Emits docs whose maybe-contaminated shingle fraction >=
    * `minHitMilli` (flag stream); flip `keep` to invert (clean pass).
    * Works identically on a batch DataFrame. */
  def decontaminateStream(docs: DataFrame, textCol: String,
                          bloomBits: Array[Byte], mBits: Int = 1 << 20,
                          numHashes: Int = 3, seed: Long = 42L,
                          minHitMilli: Long = 500L,
                          keep: Boolean = false): DataFrame = {
    require(bloomBits.length == mBits / 8,
      s"bloomBits has ${bloomBits.length} bytes; mBits=$mBits needs ${mBits / 8}")
    // the ONE canonical shingle recipe — must match what built the
    // sketch, or probes silently miss (see Dedup.shingleHashes)
    val hs = graft.operators.Dedup.shingleHashes(col(textCol))
    val flagged = docs
      .withColumn("__hs", hs)
      .withColumn("n_shingles", size(col("__hs")).cast("long"))
      .withColumn("n_hits",
        when(col("n_shingles") > 0,
          graft.functions.BloomFunctions.bloomHitCount(
            lit(bloomBits), col("__hs"), mBits, numHashes, seed))
          .otherwise(lit(0L)))
      .withColumn("hit_milli",
        when(col("n_shingles") > 0,
          expr("(n_hits * 1000) div n_shingles")).otherwise(lit(0L)))
      .drop("__hs")
    if (keep) flagged.filter(col("hit_milli") < minHitMilli)
    else flagged.filter(col("hit_milli") >= minHitMilli)
  }

  /** Streaming face of q52's temperature mixing (st08): the per-source
    * rates are precomputed on the already-seen corpus (the analog of
    * st06's prebuilt Bloom sketch — at scale they come from the last
    * batch mixing run and broadcast as a literal map), and every
    * arriving doc decides its copy count row-locally from its content
    * fingerprint. Completely stateless: no state store, no watermark,
    * no shuffle — an unseen source rates 0 and drops (retune upstream
    * when sources change). Works identically on a batch DataFrame,
    * emitting exactly Mixing.mixtureCopies' positive-copy rows. */
  def mixtureStream(docs: DataFrame, sourceCol: String, textCol: String,
                    ratesPpm: Map[String, Long]): DataFrame =
    docs
      .withColumn("rate_ppm",
        coalesce(element_at(typedLit(ratesPpm), col(sourceCol)), lit(0L)))
      .withColumn("u_ppm",
        pmod(graft.operators.TextAnalysis.fingerprint(col(textCol)),
          lit(1000000L)))
      .withColumn("copies",
        expr("rate_ppm div 1000000 " +
          "+ CASE WHEN u_ppm < rate_ppm % 1000000 THEN 1 ELSE 0 END"))
      .drop("u_ppm")
      .filter(col("copies") > 0)

  /** Streaming face of q59's curation pipeline (st10): every arriving
    * doc is quality-gated, token-counted and split-assigned ROW-LOCALLY
    * (t03/t04/t12's exact formulas — all codegen'd expressions), and
    * content the batch corpus has already admitted is dropped via a
    * prebuilt Bloom of seen content fingerprints (st06's convention:
    * the batch pipeline owns EXACT dedup; the ingest face drops
    * re-ingested copies with zero state — Bloom false positives drop
    * new docs at the usual rate, never re-admit seen ones, so the
    * filter is conservative in the safe direction). Fingerprints are
    * reduced mod P before probing — the Bloom position arithmetic is
    * affine mod P, and a raw 62-bit fingerprint would overflow it.
    * Completely stateless: no state store, no watermark, no shuffle.
    * Works identically on a batch DataFrame. */
  def curationStream(docs: DataFrame, textCol: String,
                     seenBloom: Array[Byte], mBits: Int = 1 << 20,
                     numHashes: Int = 3, seed: Long = 42L,
                     minQualityBp: Long = 5500L): DataFrame = {
    require(seenBloom.length == mBits / 8,
      s"seenBloom has ${seenBloom.length} bytes; mBits=$mBits needs ${mBits / 8}")
    import graft.operators.TextAnalysis
    docs
      .withColumn("quality_bp", TextAnalysis.qualityScoreBp(col(textCol)))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)))
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .filter(col("quality_bp") >= minQualityBp)
      .filter(graft.functions.BloomFunctions.bloomHitCount(
        lit(seenBloom), array(pmod(col("fp"), lit(2147483647L))),
        mBits, numHashes, seed) === 0)
      .withColumn("split",
        when(pmod(col("fp"), lit(100L)) < 90, "train")
          .when(pmod(col("fp"), lit(100L)) < 95, "val")
          .otherwise("test"))
  }

  /** The seen-content sketch [[curationStream]] probes: Bloom over
    * `fingerprint(text) mod P` of the already-curated corpus — built
    * batch-side, shipped to the ingest face as bytes. */
  def seenFingerprintBloom(docs: DataFrame, textCol: String,
                           mBits: Int = 1 << 20, numHashes: Int = 3,
                           seed: Long = 42L): Array[Byte] =
    docs
      .select(pmod(graft.operators.TextAnalysis.fingerprint(col(textCol)),
        lit(2147483647L)).as("h"))
      .agg(graft.functions.BloomFunctions.bloomAgg(col("h"), mBits,
        numHashes, seed).as("__bloom"))
      .head().getAs[Array[Byte]](0)

  /** Streaming face of q61's exact sliding-window distinct (st11):
    * the same dedup-first bounded fan-out, streamed — each event
    * explodes row-locally to the W/S = 6 sliding windows containing
    * its 10-minute bucket, keyed by the WINDOW START as event time,
    * then two chained stateful operators (the Spark ≥3.5 append-mode
    * chain): dropDuplicates(user, window) with a watermark bounding
    * the dedup state, and the per-window count. State per key is one
    * dedup entry until the watermark passes the window — the fan-out
    * multiplies arriving rows by 6, never the state beyond the open
    * windows. A window's count finalizes (appends) once the watermark
    * clears it — exactly q61's number for that window. The watermark
    * rides `w_ts`, which trails the event's own time by up to W−S, so
    * lateness composes: an event `lateness` late in event time is
    * still on time for every window it feeds. */
  def slidingDistinctStream(events: DataFrame,
                            lateness: String = "10 minutes"): DataFrame =
    events
      .select(col("user_id"), expr("unix_timestamp(ts) div 600").as("b"))
      .select(col("user_id"), col("b"),
        explode(expr("sequence(0, 5)")).as("i"))
      .select(col("user_id"),
        timestamp_seconds((col("b") - col("i")) * 600).as("w_ts"))
      .withWatermark("w_ts", lateness)
      .dropDuplicates("user_id", "w_ts")
      .groupBy("w_ts")
      .agg(count(lit(1)).as("n_users"))

  /** Streaming face of q64's join-size pricing (st12): the static
    * side's CMS rides as a prebuilt literal (st06's convention), the
    * arriving side's CMS accumulates as a streaming aggregate (the
    * TypedImperativeAggregate buffer lives in the state store — one
    * fixed-size matrix, not per-key rows), and every microbatch
    * re-emits the current `cms_join_size` estimate in complete mode —
    * a live "how big would this join be RIGHT NOW" gauge that only
    * ever grows toward the batch answer. Works identically on a batch
    * DataFrame (== q64's estimate). */
  def joinSizeStream(events: DataFrame, key: Column,
                     staticCms: Array[Byte], depth: Int = 3,
                     width: Int = 8192): DataFrame = {
    import graft.functions.CmsFunctions
    events.select(key.as("k"))
      .agg(CmsFunctions.cmsAgg(col("k"), depth, width).as("cms_e"))
      .select(CmsFunctions.cmsJoinSize(col("cms_e"), lit(staticCms),
        depth, width).as("est_pairs"))
  }

  /** Streaming exact dedup on a key with bounded state: watermark on
    * the event time lets Spark drop per-key state once the key can no
    * longer recur within the lateness bound — the streaming counterpart
    * of Dedup.exact. Works identically on a batch DataFrame. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  lateness: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** One (key, event) row of [[dedupAnchorChain]]'s input. */
  final case class KeyedEvent(event_id: Long, t: Timestamp, user_id: Long,
                              event_type: String)

  /** Deterministic batch face of [[dedupStream]]'s state semantics on
    * key (user_id, event_type): `dropDuplicatesWithinWatermark` keeps
    * the first event per key and holds its state until the watermark
    * passes firstTs + delay, so with in-order arrival the kept set is
    * the greedy ANCHOR CHAIN — keep e iff e.t >= previous kept anchor's
    * t + delay (a duplicate does NOT extend the anchor's expiry).
    * Batch `dropDuplicates` can't stand in for this: it keeps an
    * arbitrary partition-order-dependent row, which no oracle can
    * reproduce. Timestamps are truncated to seconds so the chain is
    * cross-engine comparable (same convention as q33).
    *
    * Scale shape: one shuffle on the key, then `flatMapSortedGroups`
    * streams each group's iterator in (t, event_id) order — the fold
    * carries ONE long of state, never materializing a group in memory
    * (Spark sorts spill-ably within partitions). StreamingSpec proves
    * multi-batch [[dedupStream]] == this face when the watermark is
    * driven past an anchor's expiry. */
  def dedupAnchorChain(events: DataFrame, delayMs: Long): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select(col("event_id"), date_trunc("second", col("ts")).as("t"),
        col("user_id"), col("event_type"))
      .as[KeyedEvent]
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapSortedGroups(col("t"), col("event_id")) { (_, it) =>
        var expiry = Long.MinValue
        it.filter { e =>
          val t = e.t.getTime
          if (t >= expiry) { expiry = t + delayMs; true } else false
        }
      }
      .toDF()
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class Session(user_id: Long, n_events: Int,
                           start: Timestamp, end: Timestamp)

  /** Merge interval fragments that are strictly within `gapMs` of each
    * other (an event at exactly `last + gap` starts a NEW session —
    * the same boundary as `session_window`'s [start, last+gap)).
    * Input size is one microbatch's events for ONE key (plus the few
    * fragments from state) — bounded by the trigger, never the corpus. */
  private def mergeFragments(ss: List[SessionState], gapMs: Long): List[SessionState] =
    ss.sortBy(_.start).foldLeft(List.empty[SessionState]) {
      case (h :: t, s) if s.start - h.last < gapMs =>
        SessionState(h.n + s.n, math.min(h.start, s.start),
          math.max(h.last, s.last)) :: t
      case (acc, s) => s :: acc
    }.reverse

  /** Gap-based sessionization with explicit state: a session closes
    * after `gapMs` of event-time inactivity (boundary identical to
    * [[sessionizeNative]]: an event at exactly `last + gap` opens a
    * new session).
    *
    * Streaming semantics are real AND late-data-correct: a fragment is
    * emitted ONLY once the watermark (driven by `lateness`) passes its
    * `last + gap` — before that, a late in-watermark event could still
    * bridge it to a later fragment, so it stays in state. State per key
    * is a handful of fragments (count + boundaries each), bounded by
    * ~lateness/gap; within a batch the per-key merge is bounded by that
    * microbatch's events, not history.
    *
    * On a batch Dataset the same fold runs once per key and end-of-data
    * closes every session — identical output to streaming the same
    * events and letting the final timeout fire (see StreamingSpec).
    * For a pure-SQL alternative see [[sessionizeNative]]. */
  def sessionize(events: Dataset[Event], gapMs: Long = 5 * 60 * 1000,
                 lateness: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", lateness) else events
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionFrags, Session](
        OutputMode.Append(), timeoutConf) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionFrags]) =>
          def emit(s: SessionState) =
            Session(uid, s.n, new Timestamp(s.start), new Timestamp(s.last))
          val prev = state.getOption.map(_.frags.toList).getOrElse(Nil)
          if (streaming) {
            val batch = it.map { e =>
              val t = e.ts.getTime; SessionState(1, t, t)
            }.toList
            val merged = mergeFragments(prev ::: batch, gapMs)
            // close only fragments no accepted event can ever bridge:
            // accepted events have t > watermark, bridging needs
            // t < last + gap, so last + gap <= watermark is final
            val wm = state.getCurrentWatermarkMs()
            val (closed, open) = merged.partition(_.last + gapMs <= wm)
            if (open.isEmpty) state.remove()
            else {
              state.update(SessionFrags(open))
              state.setTimeoutTimestamp(
                math.max(open.map(_.last + gapMs).min, wm + 1))
            }
            closed.iterator.map(emit)
          } else {
            // batch: end of input closes every session
            val merged = mergeFragments(
              prev ::: it.map { e =>
                val t = e.ts.getTime; SessionState(1, t, t)
              }.toList, gapMs)
            state.remove()
            merged.iterator.map(emit)
          }
      }
  }

  /** One funnel input row (timestamps pre-truncated by the caller if
    * cross-engine comparison is intended — q33's convention). */
  final case class FunnelEvent(user_id: Long, ts: Timestamp,
                               event_type: String)
  /** One funnel transition: the user's watermark-final stage and step
    * timestamps at the moment the stage advanced. */
  final case class FunnelUpdate(user_id: Long, stage: Int,
                                t1: Option[Timestamp], t2: Option[Timestamp],
                                t3: Option[Timestamp])

  /** Streaming strict-order funnel (the live face of q50): per user,
    * first `view`, first `click` after it, first `purchase` after that
    * click. Emits a [[FunnelUpdate]] whenever a user's FINALIZED stage
    * advances (plus one stage-0 row on first sight), so the per-user
    * row with the highest stage is always the current truth and rows
    * are never retracted — emission is gated on the watermark, never on
    * provisional in-buffer events that a late arrival could reorder.
    *
    * Late data is handled exactly, not approximately: events at or
    * above the watermark wait in a reorder buffer (bounded by the
    * lateness window) and are folded in EVENT-TIME order only once the
    * watermark seals them — a late view arriving after a buffered
    * click still claims t1 and lets that click claim t2, matching what
    * batch q50 computes over the same data (StreamingSpec proves
    * multi-batch == single-batch == batch, including that reorder).
    * Sealed progress is three optional longs per user — O(1) state for
    * the user's lifetime, which is what a funnel over an unbounded
    * stream costs by definition (completed-funnel state must persist:
    * dropping it would let a later stray `view` restart the funnel).
    *
    * On a batch Dataset the same fold runs once per user over all
    * events and emits the final row per user — the gated, DuckDB-
    * oracled face (st07). */
  /** One watermark-seal step of [[funnelState]]'s per-key state
    * machine, factored out so its two invariants are directly
    * testable (StreamingSpec drives it under a stalled watermark):
    *
    *  - the reorder buffer holds EXACTLY the events with `ts > wm` —
    *    never more (everything at-or-below the watermark folds now),
    *    never fewer (a late in-watermark arrival may still precede
    *    them). Since the watermark trails the max seen event time by
    *    the lateness window, the buffer is bounded by the key's event
    *    count inside that window, whatever order batches arrive in;
    *  - sealed progress (`folded`) only ever advances by folding
    *    below-watermark events in event-time order, so it is
    *    independent of arrival order and batch boundaries.
    */
  private[graft] def funnelSeal(prev: FunnelBuf,
                                incoming: Seq[(Long, String)],
                                wm: Long): FunnelBuf = {
    // seal strictly-below-watermark events: every future accepted
    // event has ts > wm, so nothing can reorder them
    val (ready, pending) = (prev.buf ++ incoming).partition(_._1 <= wm)
    val folded = ready.sortBy(_._1)
      .foldLeft(prev.folded)((p, e) => p.fold(e._1, e._2))
    FunnelBuf(folded, pending)
  }

  def funnelState(events: Dataset[FunnelEvent],
                  lateness: String = "10 minutes"): Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", lateness) else events
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    def emit(uid: Long, p: FunnelProg) =
      FunnelUpdate(uid, p.stage, p.t1.map(new Timestamp(_)),
        p.t2.map(new Timestamp(_)), p.t3.map(new Timestamp(_)))
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuf, FunnelUpdate](
        OutputMode.Append(), timeoutConf) {
        (uid: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelBuf]) =>
          val incoming = it.map(e => (e.ts.getTime, e.event_type)).toSeq
          if (streaming) {
            val first = state.getOption.isEmpty
            val prev = state.getOption.getOrElse(FunnelBuf(FunnelProg(None, None, None), Nil))
            val wm = state.getCurrentWatermarkMs()
            val next = funnelSeal(prev, incoming, wm)
            state.update(next)
            if (next.buf.nonEmpty)
              // wake this key once the watermark can seal its buffer
              state.setTimeoutTimestamp(math.max(next.buf.map(_._1).min, wm + 1))
            if (first || next.folded.stage > prev.folded.stage)
              Iterator.single(emit(uid, next.folded))
            else Iterator.empty
          } else {
            val folded = incoming.sortBy(_._1)
              .foldLeft(FunnelProg(None, None, None))((p, e) => p.fold(e._1, e._2))
            state.remove()
            Iterator.single(emit(uid, folded))
          }
      }
  }

  /** One as-of input row: side `"d"` (dimension update — `value` is
    * the new dimension state) or `"f"` (fact probe). Timestamps
    * pre-truncated by the caller if cross-engine comparison is
    * intended (q33's convention). */
  final case class AsofEvent(key: Long, ts: Timestamp, side: String,
                             id: Long, value: Double)
  /** One sealed fact with the dimension state in effect at its
    * timestamp (None = no dim at or before it). */
  final case class AsofOut(key: Long, fact_id: Long, fact_ts: Timestamp,
                           dim_ts: Option[Timestamp],
                           dim_value: Option[Double])

  /** One watermark-seal step of [[asofState]]'s per-key machine,
    * factored out like [[funnelSeal]] so its invariants are directly
    * testable:
    *
    *  - rows with `ts <= wm` seal NOW, in (ts, side, id) order — side
    *    `"d" < "f"`, so a dim sharing a fact's exact timestamp applies
    *    to it (the ASOF `fact.ts >= dim.ts` tie rule), and equal-ts
    *    dims resolve to the highest id (`arg_max(value, id)`);
    *  - every accepted row has ts above the watermark the previous
    *    seal ran at, and the sealed dim was at or below it — so the
    *    unconditional overwrite inside the ts-ordered fold is exactly
    *    "latest dim at-or-below each fact";
    *  - sealed dims collapse to ONE (ts, id, value) triple: a future
    *    fact has ts > wm and can only match the latest of them.
    */
  private[graft] def asofSeal(prev: AsofBuf,
                              incoming: Seq[(Long, String, Long, Double)],
                              wm: Long): (AsofBuf, Seq[AsofOut]) = {
    val (ready, pending) = (prev.buf ++ incoming).partition(_._1 <= wm)
    var dTs = prev.dimTs
    var dId = prev.dimId
    var dVal = prev.dimVal
    val out = Seq.newBuilder[AsofOut]
    ready.sortBy(r => (r._1, r._2, r._3)).foreach { case (ts, side, id, v) =>
      if (side == "d") { dTs = Some(ts); dId = id; dVal = v }
      else out += AsofOut(0L, id, new Timestamp(ts),
        dTs.map(new Timestamp(_)), dTs.map(_ => dVal))
    }
    (AsofBuf(dTs, dId, dVal, pending), out.result())
  }

  /** Streaming AS-OF join — the live feature-store join (the streaming
    * face of q26): facts ("f") pick up the latest dimension update
    * ("d") at or below their event time, per key. Spark has no
    * stream-stream as-of join; the composition here is the st07
    * reorder machinery on a two-sided input: both streams union into
    * one keyed stream, rows wait in a lateness-bounded buffer, and
    * once the watermark seals a fact's timestamp NO dim at or below it
    * can still be accepted — so each fact emits exactly once, with
    * exactly the dim a batch as-of join over the same data matches
    * (StreamingSpec proves multi-batch == batch through late
    * cross-side reorderings).
    *
    * State per key is the latest SEALED dim (sealed dims collapse —
    * O(1) forever) plus the reorder buffer (bounded by the lateness
    * window). On a batch Dataset the same fold runs once per key —
    * the gated, DuckDB-ASOF-JOIN-oracled face (st09). */
  def asofState(events: Dataset[AsofEvent],
                lateness: String = "10 minutes"): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", lateness) else events
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    src.groupByKey(_.key)
      .flatMapGroupsWithState[AsofBuf, AsofOut](
        OutputMode.Append(), timeoutConf) {
        (key: Long, it: Iterator[AsofEvent], state: GroupState[AsofBuf]) =>
          val incoming = it.map(e => (e.ts.getTime, e.side, e.id, e.value)).toSeq
          val empty = AsofBuf(None, 0L, 0.0, Nil)
          if (streaming) {
            val prev = state.getOption.getOrElse(empty)
            val wm = state.getCurrentWatermarkMs()
            val (next, outs) = asofSeal(prev, incoming, wm)
            state.update(next)
            if (next.buf.nonEmpty)
              state.setTimeoutTimestamp(math.max(next.buf.map(_._1).min, wm + 1))
            outs.iterator.map(_.copy(key = key))
          } else {
            val (_, outs) = asofSeal(empty, incoming, Long.MaxValue)
            state.remove()
            outs.iterator.map(_.copy(key = key))
          }
      }
  }

  /** Stream-stream interval self-join: pair events of the same user
    * whose event times fall within `windowSec` of each other
    * (`id_a < id_b` orients each pair once). Both sides carry a
    * watermark and the join condition bounds event time in BOTH
    * directions, so Spark can expire per-key state — without the time
    * bound a stream-stream join buffers forever. Works identically on
    * batch DataFrames (the watermark is a no-op there), which is what
    * the spec checks the streaming result against. */
  def intervalJoin(events: DataFrame, windowSec: Long,
                   lateness: String = "10 minutes"): DataFrame = {
    val l = events.select(col("event_id").as("id_a"),
      col("user_id"), col("ts").as("ts_a")).withWatermark("ts_a", lateness)
    val r = events.select(col("event_id").as("id_b"),
      col("user_id").as("user_b"), col("ts").as("ts_b"))
      .withWatermark("ts_b", lateness)
    l.join(r,
      col("user_id") === col("user_b") &&
        col("id_a") < col("id_b") &&
        col("ts_b") >= col("ts_a") - expr(s"INTERVAL $windowSec SECONDS") &&
        col("ts_b") <= col("ts_a") + expr(s"INTERVAL $windowSec SECONDS"))
      .select(col("user_id"), col("id_a"), col("id_b"), col("ts_a"), col("ts_b"))
  }

  /** Batch-optimized face of [[intervalJoin]] — identical pairs, banded
    * into an equi-join on (user, time bucket): a row in window-sized
    * bucket b can only pair with rows in buckets b-1..b+1, so each left
    * row probes 3 buckets instead of meeting EVERY same-user row before
    * the time filter (the d03-style candidate-bounding trick, same as
    * [[graft.operators.RangeJoin]] but bidirectional). The time
    * predicate stays on the exact timestamps — buckets only prune
    * candidates, they never decide membership. The stream face keeps
    * the plain condition (stream-stream state pruning reads the raw
    * time bounds); JoinPropertySpec proves the two faces equal. */
  def intervalJoinBanded(events: DataFrame, windowSec: Long): DataFrame = {
    val e = events.select(col("event_id"), col("user_id"), col("ts"),
      floor(col("ts").cast("long") / windowSec).as("bucket"))
    val l = e.select(col("event_id").as("id_a"), col("user_id"),
      col("ts").as("ts_a"),
      explode(array(col("bucket") - 1, col("bucket"),
        col("bucket") + 1)).as("probe"))
    val r = e.select(col("event_id").as("id_b"),
      col("user_id").as("user_b"), col("ts").as("ts_b"),
      col("bucket").as("bucket_b"))
    l.join(r,
        col("user_id") === col("user_b") && col("probe") === col("bucket_b") &&
        col("id_a") < col("id_b") &&
        col("ts_b") >= col("ts_a") - expr(s"INTERVAL $windowSec SECONDS") &&
        col("ts_b") <= col("ts_a") + expr(s"INTERVAL $windowSec SECONDS"))
      .select(col("user_id"), col("id_a"), col("id_b"),
        col("ts_a"), col("ts_b"))
  }

  /** Spark-native gap sessionization via `session_window` — the
    * declarative path: state-store-backed on streams (add a watermark
    * upstream), a plain shuffle-and-merge aggregation in batch, and the
    * planner handles merging/expiry. Output: one row per (user,
    * session) with the session's true event span (`s_end` = last event
    * time, not last+gap). */
  def sessionizeNative(events: DataFrame, gap: String = "5 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("s_end"))
      .select(col("user_id"), col("sw.start").as("s_start"),
        col("s_end"), col("n_events"))

  /** One CDC changelog row for [[upsertState]]: `op` ∈
    * insert|update|delete, `seq` = upstream commit order. */
  final case class ChangeRow(key: Long, seq: Long, op: String, value: Double)

  /** The materialized current version of a key after a batch of
    * changes: `live = false` is a delete notification (value retains
    * the tombstone's seq so downstream consumers can order it). */
  final case class UpsertOut(key: Long, seq: Long, live: Boolean,
                             value: Double)

  /** Streaming MERGE upsert (st13) — q68's live face: a CDC changelog
    * stream materialized into per-key state, emitting each touched
    * key's new current version per microbatch (Update-mode changelog —
    * exactly what a downstream sink applies idempotently).
    *
    * Conflict rule is LAST-WRITER-WINS ON `seq`, which makes the fold
    * ORDER-INSENSITIVE: a stale change arriving after a newer one
    * (cross-batch reordering, replayed partitions) is ignored because
    * state keeps the max seq — no reorder buffer needed, the LWW
    * register argument. Deletes store a TOMBSTONE (seq kept, value
    * dead) rather than clearing state: dropping it would let a stale
    * pre-delete update resurrect the row — the classic CDC
    * apply-side corruption. A change with seq <= the applied seq is
    * IGNORED — including equality, which makes at-least-once
    * redelivery of the same change idempotent. (This is deliberately
    * weaker than q68's batch operator, which sees the whole batch and
    * can refuse same-seq CONFLICTS loudly; a stream that already
    * applied seq s cannot distinguish "conflicting second change at
    * s" from "redelivery of the change it applied" without keeping
    * every seen change — so it must pick the convergent reading, and
    * idempotent replay is the one that makes the fold arrival-order-
    * insensitive.) The same argument must also hold WITHIN a
    * microbatch: distinct changes sharing one seq are resolved by the
    * deterministic (seq, op, value) total order, never by arrival
    * order — so the winner is replay-stable there too. Update ops on
    * absent keys insert (upsert — feeds mislabel insert/update after
    * replays, same as q68).
    *
    * State per key is O(1) (seq, live, value) and the state size is
    * the key cardinality — a materialized table IS its state; at
    * 100 TB the state store is RocksDB-backed and this op's state is
    * the table's current version, which is the minimum any streaming
    * materialization holds. On a batch Dataset the same fold runs once
    * per key and equals `Diff.applyChangeset(empty-snapshot, batch)` —
    * the spec pins stream == batch face == q68's operator. */
  def upsertState(changes: Dataset[ChangeRow]): Dataset[UpsertOut] = {
    import changes.sparkSession.implicits._
    val streaming = changes.isStreaming
    changes.groupByKey(_.key)
      .mapGroupsWithState[UpsertSt, UpsertOut](GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[ChangeRow], state: GroupState[UpsertSt]) =>
          var st = state.getOption.getOrElse(
            UpsertSt(Long.MinValue, live = false, 0.0))
          // Total order, not just seq: two DISTINCT changes sharing a
          // seq within one microbatch would otherwise be resolved by
          // arrival order (stable sort), which is shuffle-iteration-
          // dependent — the winner could flip across replays/retries,
          // breaking the arrival-order-insensitive convergence claim.
          // (op, value) completes the order deterministically; the
          // first in it wins because equal-seq successors are ignored.
          it.toSeq.sortBy(c => (c.seq, c.op, c.value)).foreach { c =>
            if (c.seq > st.seq) st = c.op match {
              case "insert" | "update" => UpsertSt(c.seq, live = true, c.value)
              case "delete" => UpsertSt(c.seq, live = false, 0.0)
              case other => throw new IllegalStateException(
                s"upsertState: unknown op '$other' for key $key")
            }
          }
          if (streaming) state.update(st) else state.remove()
          UpsertOut(key, st.seq, st.live, st.value)
      }
  }

  /** One per-range digest emitted by [[rangeChecksumStream]] — the
    * same (count, xor, modular-sum) triple [[graft.operators.Diff
    * .rangeDigest]] computes over a table at rest. */
  final case class RangeDigestOut(range_id: Long, n_rows: Long,
                                  xor64: Long, sum31: Long)

  /** LIVE Merkle range-digest gauge (st15) — q72's streaming face: a
    * CDC changelog stream folded into per-RANGE state, each microbatch
    * re-emitting the touched ranges' current digests (Update-mode
    * gauge, st12's convention). A replica consuming the same changelog
    * can compare digests continuously instead of scheduling full
    * checksum scans — anti-entropy as a standing query.
    *
    * The digest is over the LIVE rows the changelog materializes
    * (the upsertState fold per key, inside range-keyed state): LWW on
    * seq, tombstones block resurrection, same-seq resolves by the
    * (seq, op, value) total order, unknown ops loud. Row hash is the
    * SAME portable md5-prefix integer `rangeDigest` uses, over
    * "key|value" with Spark's double→string rendering — so the
    * streamed digests are bit-comparable with a batch `rangeDigest`
    * over the materialized table (the spec pins that equality).
    *
    * State per range is the range's live rows — summed over ranges
    * that is the key cardinality, the same floor as st13's
    * materialization, but grouped into range-sized values (the Merkle
    * leaf width is the `rangeSize` knob): a RocksDB state store
    * rewrites a leaf per touched range per batch, the honest price of
    * whole-range digests. Keys must be non-negative (range_id =
    * key / rangeSize, the q72 convention). */
  def rangeChecksumStream(changes: Dataset[ChangeRow],
                          rangeSize: Long): Dataset[RangeDigestOut] = {
    require(rangeSize > 0, "rangeChecksumStream: rangeSize must be positive")
    import changes.sparkSession.implicits._
    val streaming = changes.isStreaming
    changes.groupByKey(_.key / rangeSize)
      .mapGroupsWithState[Map[Long, UpsertSt], RangeDigestOut](
        GroupStateTimeout.NoTimeout()) {
        (rid: Long, it: Iterator[ChangeRow],
         state: GroupState[Map[Long, UpsertSt]]) =>
          var rows = state.getOption.getOrElse(Map.empty[Long, UpsertSt])
          it.toSeq.sortBy(c => (c.seq, c.op, c.value)).foreach { c =>
            val cur = rows.getOrElse(c.key,
              UpsertSt(Long.MinValue, live = false, 0.0))
            if (c.seq > cur.seq) rows = c.op match {
              case "insert" | "update" =>
                rows + (c.key -> UpsertSt(c.seq, live = true, c.value))
              case "delete" =>
                rows + (c.key -> UpsertSt(c.seq, live = false, 0.0))
              case other => throw new IllegalStateException(
                s"rangeChecksumStream: unknown op '$other' for key ${c.key}")
            }
          }
          if (streaming) state.update(rows) else state.remove()
          var n = 0L; var x = 0L; var s31 = 0L
          rows.foreach { case (k, st) =>
            if (st.live) {
              val h = rowHash52(s"$k|${st.value}")
              n += 1; x ^= h; s31 += h % 2147483648L
            }
          }
          RangeDigestOut(rid, n, x, s31)
      }
  }

  /** The 52-bit portable row hash `rangeDigest` computes in SQL
    * (first 13 hex chars of md5 → BIGINT), here for state-side use. */
  private def rowHash52(s: String): Long =
    graft.functions.Md5Prefix52Util.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))

  /** One CLOSED SCD2 version emitted by [[scd2Stream]]: the key held
    * `value` over the half-open seq interval `[valid_from, valid_to)`.
    * Closed intervals never change, which is why the stream runs in
    * Append mode — the output is a plain append-only history table. */
  final case class Scd2Closed(key: Long, valid_from: Long, valid_to: Long,
                              value: Double)

  /** Streaming SCD TYPE-2 history (st14) — q70's live face: the CDC
    * changelog stream folded into per-key OPEN-version state, emitting
    * each version the moment a newer change CLOSES it. The open
    * version is deliberately NOT emitted (it isn't final); the
    * materialized current row is [[upsertState]]'s job — run both
    * against one changelog and you have the live table AND its
    * append-only history, the lakehouse pair.
    *
    * Conflict rules are [[upsertState]]'s, for the same convergence
    * reasons: changes at seq <= the open version's seq are IGNORED
    * (idempotent redelivery; a late below-state change would need
    * retroactive history rewrite, which only the batch operator
    * [[graft.operators.Diff.scd2History]] can do — the documented
    * weakening, like st13 vs q68), same-seq changes within a batch
    * resolve by the (seq, op, value) total order, unknown ops fail
    * loudly. Deletes close the open version and open nothing — the
    * validity GAP q70 keeps.
    *
    * State per key is O(1) (the open version) and closed rows leave
    * immediately: at 100 TB the state store holds the key cardinality
    * and the history accumulates in the SINK, not in state — Append
    * mode writes straight to files with no changelog sink required.
    * On a batch Dataset the same fold runs once per key and equals
    * the closed (is_current = false) rows of [[Diff.scd2History]] —
    * the spec pins stream == batch face == q70's operator. */
  def scd2Stream(changes: Dataset[ChangeRow]): Dataset[Scd2Closed] = {
    import changes.sparkSession.implicits._
    val streaming = changes.isStreaming
    changes.groupByKey(_.key)
      .flatMapGroupsWithState[UpsertSt, Scd2Closed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[ChangeRow], state: GroupState[UpsertSt]) =>
          var st = state.getOption.getOrElse(
            UpsertSt(Long.MinValue, live = false, 0.0))
          val out = List.newBuilder[Scd2Closed]
          it.toSeq.sortBy(c => (c.seq, c.op, c.value)).foreach { c =>
            if (c.seq > st.seq) {
              if (st.live) out += Scd2Closed(key, st.seq, c.seq, st.value)
              st = c.op match {
                case "insert" | "update" => UpsertSt(c.seq, live = true, c.value)
                case "delete" => UpsertSt(c.seq, live = false, 0.0)
                case other => throw new IllegalStateException(
                  s"scd2Stream: unknown op '$other' for key $key")
              }
            }
          }
          if (streaming) state.update(st) else state.remove()
          out.result().iterator
      }
  }

  /** One anomaly-gauge input row (q81's shape). */
  final case class AnomEvent(event_type: String, ts: Timestamp,
                             event_id: Long, value: Double)
  /** One emitted alert: the event scored above its moving baseline. */
  final case class AnomAlert(event_type: String, event_id: Long,
                             value: Double)
  /** Per-type state: the last up-to-100 SEALED values as exact scale-4
    * longs (value, value²) in seal order, their running sums (exact
    * integer arithmetic — evicting a value subtracts exactly, so the
    * running sums never drift from a recompute), and the reorder
    * buffer of still-above-watermark rows. */
  final case class AnomBuf(hist: Vector[(Long, Long)],
                           sumV: Long, sumV2: Long,
                           pending: List[(Long, Long, Double)])

  private val AnomWindow = 100

  /** One watermark-seal step of [[anomalyState]]'s per-key machine,
    * factored out like [[funnelSeal]] so its invariants are directly
    * testable:
    *
    *  - rows with `ts <= wm` seal NOW in (ts, event_id) order — the
    *    same total order as q81's window frame, so the streamed scores
    *    are bit-identical to the batch gauge whatever order batches
    *    arrived in;
    *  - each sealing row scores BEFORE it enters the history (q81's
    *    1-PRECEDING frame end: a spike never suppresses itself through
    *    its own σ contribution), and only against a FULL history
    *    (exactly 100 sealed predecessors);
    *  - the closing math is q81's exactly: sx/sxx through the same
    *    scale-4 decimal per-row conversion ([[Scaled4Util.toScaled]])
    *    and decimal→double hop, then identical IEEE double ops;
    *  - state is O(1): the history is capped at 100 pairs of longs and
    *    the pending buffer holds only above-watermark rows. */
  private[graft] def anomalySeal(prev: AnomBuf,
                                 incoming: Seq[(Long, Long, Double)],
                                 wm: Long): (AnomBuf, List[(Long, Double)]) = {
    val (ready, pending) = (prev.pending ++ incoming).partition(_._1 <= wm)
    var hist = prev.hist
    var sumV = prev.sumV
    var sumV2 = prev.sumV2
    val alerts = List.newBuilder[(Long, Double)]
    ready.sortBy(r => (r._1, r._2)).foreach { case (_, id, v) =>
      if (hist.size == AnomWindow) {
        val sx = java.math.BigDecimal.valueOf(sumV, 4).doubleValue()
        val sxx = java.math.BigDecimal.valueOf(sumV2, 4).doubleValue()
        val mean = sx / 100.0
        val thr = mean + 1.5 * math.sqrt(
          math.max(sxx / 100.0 - mean * mean, 0.0))
        if (v > thr) alerts += ((id, v))
      }
      val sv = graft.functions.Scaled4Util.toScaled(v)
      val sv2 = graft.functions.Scaled4Util.toScaled(v * v)
      hist = hist :+ ((sv, sv2))
      sumV += sv; sumV2 += sv2
      if (hist.size > AnomWindow) {
        val (ev, ev2) = hist.head
        hist = hist.tail
        sumV -= ev; sumV2 -= ev2
      }
    }
    (AnomBuf(hist, sumV, sumV2, pending), alerts.result())
  }

  /** Streaming rolling-anomaly gauge — q81's moving-baseline alarm as
    * a standing query: each event scores against the exact mean/σ of
    * the 100 events sealed before it in its type's stream and emits an
    * [[AnomAlert]] when it exceeds mean + 1.5σ. Watermark semantics
    * follow [[funnelState]]: above-watermark rows wait in a reorder
    * buffer, seals run in event-time order, and a timeout wakes the
    * key when the watermark passes its oldest pending row — so the
    * alert stream is arrival-order-independent and equal to the batch
    * face (spec-pinned). On a batch Dataset the same seal runs once
    * per key with an open watermark and the output is exactly the
    * anomaly rows of q81's window plan — the gated batch face. */
  def anomalyState(events: Dataset[AnomEvent],
                   lateness: String = "10 minutes"): Dataset[AnomAlert] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", lateness) else events
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    src.groupByKey(_.event_type)
      .flatMapGroupsWithState[AnomBuf, AnomAlert](
        OutputMode.Append(), timeoutConf) {
        (tpe: String, it: Iterator[AnomEvent], state: GroupState[AnomBuf]) =>
          val incoming = it.map(e => (e.ts.getTime, e.event_id, e.value)).toSeq
          val prev = state.getOption.getOrElse(AnomBuf(Vector.empty, 0L, 0L, Nil))
          val wm = if (streaming) state.getCurrentWatermarkMs() else Long.MaxValue
          val (next, alerts) = anomalySeal(prev, incoming, wm)
          if (streaming) {
            state.update(next)
            if (next.pending.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(next.pending.map(_._1).min, wm + 1))
          } else state.remove()
          alerts.iterator.map { case (id, v) => AnomAlert(tpe, id, v) }
      }
  }
}
