package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Globally-ordered running totals without a single-reducer window.
  *
  * A `SUM(...) OVER (ORDER BY ord)` window with an empty PARTITION BY
  * moves EVERY row into one task — the one plan shape this repo bans
  * (SURVEY §4 "no global window"). Yet training-data packing genuinely
  * needs a corpus-wide prefix sum: shard boundaries must fall on the
  * global running token total, not a per-group one (q42 solves the
  * per-group case; this solves the global case).
  *
  * Classic two-phase distributed prefix sum, expressed as Spark plans:
  *
  *  1. Bucket every row by a PREFIX of its ordering key, so each bucket
  *     is a contiguous range of the global order (e.g. the first hex
  *     char of the md5 ordering key → 16 ranges).
  *  2. Cumsum within each bucket with a bucket-PARTITIONED window —
  *     parallel across buckets, spill-safe within one.
  *  3. Compute each bucket's total with one map-side-combined
  *     aggregation (output = nBuckets rows), turn totals into starting
  *     offsets with a window over that TINY aggregate, and broadcast
  *     the offsets back onto the fact rows.
  *
  * `global_cum(row) = bucket_offset + local_cum(row)` — exactly the
  * single-reducer window's answer (the oracle checks this equality),
  * but the fact table never concentrates: wall-clock is dominated by
  * the per-bucket windows, which scale out with bucket count. At 100 TB
  * you'd widen the prefix (2 hex chars → 256 buckets, 4 → 64k); the
  * offsets stage stays metadata-sized either way.
  */
object Packing {

  /** Appends `outCol` = running sum of `weight` over the global order
    * (`ordCols`, ascending, NULLS-free keys expected). `bucket` MUST be
    * a prefix of the first ordering key (same collation), so that
    * bucket order == global order of the ranges; that contract is the
    * whole trick and is the caller's to honor (q53 derives both from
    * one md5 call, so it holds by construction). `ordCols` must also
    * form a UNIQUE total order over the rows: with duplicate ordering
    * tuples the ROWS-frame cumsum is peer-order dependent, so results
    * (and equality with the naive-window oracle) become
    * nondeterministic (q53 guarantees uniqueness via its doc_id
    * tiebreak).
    */
  def globalRunningSum(
      df: DataFrame,
      bucket: Column,
      ordCols: Seq[Column],
      weight: Column,
      outCol: String,
      totCol: Option[String] = None): DataFrame = {
    val b = "__gps_bucket"
    val w = "__gps_w"
    val loc = "__gps_local"
    val off = "__gps_off"
    val tot = "__gps_tot"

    val fact = df.withColumn(b, bucket).withColumn(w, weight)

    // Phase 1+2: parallel per-bucket cumsum.
    val wLocal = Window.partitionBy(b).orderBy(ordCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = fact.withColumn(loc, sum(col(w)).over(wLocal))

    // Phase 3: nBuckets-row exclusive prefix over bucket totals. The
    // empty-partition window here is over the AGGREGATE (tens to
    // thousands of rows), not the fact table — the same small-side
    // exemption as the one-row crossJoin scalar attachments.
    // With totCol set, the GRAND total rides the same bucket-total
    // aggregate (an unbounded window over the nBuckets rows) and the
    // same broadcast join — callers that need cumsum + total (q71's
    // grid test) get both from ONE offsets pass instead of paying a
    // separate full-corpus aggregate scan for the scalar.
    val wOff = Window.orderBy(b)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets0 = fact.groupBy(b).agg(sum(col(w)).as(tot))
      .withColumn(off, coalesce(sum(col(tot)).over(wOff), lit(0L)))
    val offsets = totCol.fold(offsets0.select(col(b), col(off)))(tc =>
      offsets0.withColumn(tc, sum(col(tot)).over(wAll))
        .select(col(b), col(off), col(tc)))

    local.join(broadcast(offsets), b)
      .withColumn(outCol, col(off) + col(loc))
      .drop(b, w, loc, off)
  }
}
