package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, GraftInternal}
import org.apache.spark.sql.functions._

/** Explicit salt-based skew handling for shuffle joins.
  *
  * AQE's skew-join split (demonstrated in SkewSpec) rebalances
  * oversized PARTITIONS after the map stage, but a single pathological
  * KEY — one user with 10^9 events joining its orders — still lands
  * every probe row in one task's hash bucket (and with few mappers,
  * e.g. a compact upstream scan, AQE has no map-output ranges to split
  * by). Salting splits the KEY itself: the big side scatters each key
  * across `numSalts` shuffle buckets, the small-per-key side is
  * replicated `numSalts`× so every scattered row still meets its
  * matches, and the join result is IDENTICAL to the unsalted join (the
  * oracle for q45 is literally the plain join) while the hot key's
  * work spreads over `numSalts` tasks.
  *
  * Replication is paid ONLY for detected hot keys (`hotKeyThreshold`):
  * one count aggregate over the left side's keys (map-side combined —
  * tiny output) finds keys with >= threshold rows; those route through
  * the salted join, everything else through a plain join, results
  * unioned. The hot-key set rides the plan as a lazy scalar subquery
  * (see [[GraftInternal.scalarSubquery]]) — no driver action at
  * call time, so the operator composes inside uncollected pipelines.
  * At most N/threshold keys can be hot — a bound that is only small
  * when the threshold follows the sizing contract below, which
  * `maxHotKeys` enforces. Blanket replication of the whole right side
  * (`hotKeyThreshold = 0`) is the scale-killer this avoids: at 100 TB
  * it multiplies the right side's shuffle volume `numSalts`× for keys
  * that were never skewed.
  *
  * Detection keys on LEFT-side frequency (the scattered side). If the
  * skew lives in the RIGHT side's per-key multiplicity instead, swap
  * the sides — the left of this operator is always "the side whose
  * rows scatter".
  *
  * SIZING CONTRACT — threshold vs hot-set size. The hot-key set rides
  * the plan as ONE array probed with `array_contains`: a LINEAR scan
  * per probe row, O(|hot set|) comparisons each. That is the right
  * trade only while the set is small (tens to thousands). "At most
  * N/threshold keys can be hot" bounds the set ONLY if the threshold
  * scales with N — pick `hotKeyThreshold >= left rows / desired
  * tasks` (i.e. at least the row count that already fills one task;
  * smaller thresholds salt keys that were never a straggler and grow
  * the scan). `maxHotKeys` enforces the contract at runtime: the
  * detection subquery fails LOUDLY when the hot set exceeds it,
  * instead of silently turning every probe row into a long array
  * scan. At 100 TB with threshold=1000 the N/threshold bound is
  * ~10^11 — the guard is what turns that misconfiguration into an
  * error message naming the fix (raise the threshold) rather than a
  * mysteriously CPU-bound probe stage.
  *
  * The salt is derived from `saltBy` (any left-side expression — use a
  * unique id for an even spread), NOT from `rand()`: a deterministic
  * salt keeps the join correct under task retry and speculative
  * execution — a rerun map task re-derives the SAME salt for every
  * row, where a fresh `rand()` would send retried rows to different
  * buckets than their first attempt (rows double-counted or lost,
  * corruption that only shows up at scale when retries happen).
  *
  * Cost model: replication multiplies the hot-key slice of the right
  * side's shuffle volume by `numSalts` — size `numSalts` to the skew
  * (hot-key rows / desired rows per task), not higher. For dims small
  * enough to broadcast, use `broadcast()` instead; salting is for the
  * fact-fact case where BOTH sides are too big to broadcast and one
  * has hot keys. */
object SkewJoin {

  /** Internal column names are uniquified per call so an input that
    * already carries a `__salt`-like column is never silently
    * overwritten and dropped. */
  private val nameSeq = new AtomicLong()
  private def fresh(tag: String): String = s"__graft_${tag}_${nameSeq.incrementAndGet()}"

  /** Inner-join `left` (the skewed/big side) to `right` on
    * `leftKey === rightKey`, spreading each hot left key over
    * `numSalts` shuffle buckets.
    *
    * `hotKeyThreshold` > 0 (recommended): two-phase — keys with
    * >= threshold left rows are salted, the rest take a plain join.
    * `hotKeyThreshold` = 0: legacy blanket salting — every key
    * scatters and the ENTIRE right side is replicated `numSalts`×;
    * only sensible when the caller knows every key is hot.
    *
    * `maxHotKeys` caps the detected hot-set size (see the sizing
    * contract above); the first action fails loudly when exceeded.
    *
    * Salt ONLY joins whose output rows are themselves the product
    * (enrichment, feature joins). If the join feeds a distributive
    * aggregate, factor the aggregate through the join instead —
    * pre-aggregate per key on each side and multiply partial
    * counts/sums — and the hot key collapses to one row per side
    * before any shuffle (measured at sf1: 1.4 s factored vs 72.4 s
    * salted vs 694.6 s plain — q49/q45/q48 in graft.queries).
    *
    * Output columns = left's then right's (internal salt columns are
    * dropped). */
  def saltedJoin(left: DataFrame, leftKey: Column, saltBy: Column,
                 right: DataFrame, rightKey: Column,
                 numSalts: Int = 16,
                 hotKeyThreshold: Long = 0L,
                 maxHotKeys: Int = 10000): DataFrame = {
    require(numSalts >= 1, s"numSalts must be >= 1, got $numSalts")
    require(hotKeyThreshold >= 0L,
      s"hotKeyThreshold must be >= 0 (0 = salt every key), got $hotKeyThreshold")
    require(maxHotKeys >= 1, s"maxHotKeys must be >= 1, got $maxHotKeys")
    if (hotKeyThreshold == 0L) saltAll(left, leftKey, saltBy, right, rightKey, numSalts)
    else {
      val ks = fresh("hotset")
      // keys with >= threshold left rows, as ONE array in ONE row —
      // executed lazily as a scalar subquery on the plan's first
      // action. assert_true rides INSIDE the subquery so the size cap
      // trips on that same first action, not at call time.
      val hotKeys = GraftInternal.scalarSubquery(
        hotKeySet(left, leftKey, hotKeyThreshold)
          .agg(collect_list(col("__graft_hotkey")).as(ks))
          .select(when(assert_true(size(col(ks)) <= maxHotKeys, concat(
              lit("saltedJoin hot-key set has "), size(col(ks)),
              lit(s" keys (> maxHotKeys=$maxHotKeys); each probe row scans " +
                s"this set linearly — raise hotKeyThreshold (currently " +
                s"$hotKeyThreshold; contract: >= left rows / desired tasks) " +
                "or raise maxHotKeys if the scan cost is understood")))
            .isNull, col(ks)).as(ks)))
      val lIsHot = array_contains(hotKeys, leftKey)
      val rIsHot = array_contains(hotKeys, rightKey)
      val hot = saltAll(
        left.filter(lIsHot), leftKey, saltBy,
        right.filter(rIsHot), rightKey, numSalts)
      // NULL keys fall to the tail (array_contains yields NULL → both
      // hot filters drop them); the inner join discards them either way
      val tail = left.filter(not(coalesce(lIsHot, lit(false))))
        .join(right.filter(not(coalesce(rIsHot, lit(false)))),
          leftKey === rightKey)
      hot.union(tail)
    }
  }

  /** Hot-key detection used by [[saltedJoin]]: the distinct left keys
    * with >= `threshold` rows, one `__graft_hotkey` column. Exposed
    * package-private so SkewSpec can pin the threshold boundary
    * (exactly-threshold is hot, threshold-1 is not) without reverse-
    * engineering the subquery out of a plan string. */
  private[graft] def hotKeySet(left: DataFrame, leftKey: Column,
                               threshold: Long): DataFrame =
    left.select(leftKey.as("__graft_hotkey"))
      .groupBy("__graft_hotkey").agg(count(lit(1)).as("__graft_cnt"))
      .filter(col("__graft_cnt") >= threshold)
      .select("__graft_hotkey")

  /** Blanket salting: every left key scatters, whole right side
    * replicated `numSalts`×.
    *
    * The explicit probe-side repartition IS the operator's effect, not
    * an optimization: when the replicated right side is small enough
    * to broadcast, the join otherwise runs INSIDE the probe side's
    * upstream tasks — a single-row-group file (this repo's bench
    * input) or any compact upstream is ONE task, and every hot output
    * row is produced by that one task, salt or no salt (measured:
    * q45 salted was NO faster than unsalted q48 — 10.1 s vs 8.1 s —
    * until this exchange existed; 0.9 s after). The partition count
    * is PINNED (repartition-by-num): the probe slice's map output is
    * tiny, so AQE's coalescing would fold the by-column form back to
    * one partition and re-defeat the salt; under an SMJ (both sides
    * too big to broadcast) the same exchange satisfies the join's
    * (key, salt) clustering requirement when the count matches
    * spark.sql.shuffle.partitions, so nothing shuffles twice. Cost:
    * one shuffle of the (hot-only, under hotKeyThreshold) probe
    * slice — bytes proportional to the hot input, not the join
    * output. */
  private def saltAll(left: DataFrame, leftKey: Column, saltBy: Column,
                      right: DataFrame, rightKey: Column,
                      numSalts: Int): DataFrame = {
    val saltL = fresh("salt_l")
    val saltR = fresh("salt_r")
    val parts = math.max(numSalts,
      left.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    val l = left.withColumn(saltL, pmod(xxhash64(saltBy), lit(numSalts)))
      .repartition(parts, leftKey, col(saltL))
    val r = right.withColumn(saltR,
      explode(array((0 until numSalts).map(s => lit(s.toLong)): _*)))
    l.join(r, leftKey === rightKey && col(saltL) === col(saltR))
      .drop(saltL, saltR)
  }
}
