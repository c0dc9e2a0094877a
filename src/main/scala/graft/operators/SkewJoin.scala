package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit salt-based skew handling for shuffle joins.
  *
  * AQE's skew-join split (demonstrated in SkewSpec) rebalances
  * oversized PARTITIONS after the map stage, but a single pathological
  * KEY — one user with 10^9 events joining its orders — still lands
  * every probe row in one task's hash bucket. Salting splits the KEY
  * itself: the big side scatters each key across `numSalts` shuffle
  * buckets, the small-per-key side is replicated `numSalts`× so every
  * scattered row still meets its matches, and the join result is
  * IDENTICAL to the unsalted join (the oracle for q45 is literally the
  * plain join) while the hot key's work spreads over `numSalts` tasks.
  *
  * The salt is derived from `saltBy` (any left-side expression — use a
  * unique id for an even spread), NOT from `rand()`: a deterministic
  * salt keeps the join correct under task retry and speculative
  * execution — a rerun map task re-derives the SAME salt for every
  * row, where a fresh `rand()` would send retried rows to different
  * buckets than their first attempt (rows double-counted or lost,
  * corruption that only shows up at scale when retries happen).
  *
  * Cost model: replication multiplies the small side's shuffle volume
  * by `numSalts` — size it to the skew (hot-key rows / desired rows
  * per task), not higher. For dims small enough to broadcast, use
  * `broadcast()` instead; salting is for the fact-fact case where
  * BOTH sides are too big to broadcast and one has hot keys. */
object SkewJoin {

  /** Inner-join `left` (the skewed/big side) to `right` on
    * `leftKey === rightKey`, spreading each left key over `numSalts`
    * shuffle buckets. Output columns = left's then right's (the
    * internal salt columns are dropped). */
  def saltedJoin(left: DataFrame, leftKey: Column, saltBy: Column,
                 right: DataFrame, rightKey: Column,
                 numSalts: Int = 16): DataFrame = {
    require(numSalts >= 1, s"numSalts must be >= 1, got $numSalts")
    val l = left.withColumn("__salt_l", pmod(xxhash64(saltBy), lit(numSalts)))
    val r = right.withColumn("__salt_r",
      explode(array((0 until numSalts).map(s => lit(s.toLong)): _*)))
    l.join(r, leftKey === rightKey && col("__salt_l") === col("__salt_r"))
      .drop("__salt_l", "__salt_r")
  }
}
