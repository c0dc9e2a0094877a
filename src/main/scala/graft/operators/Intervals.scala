package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over (key, start, end) rows — the reshape layer
  * that turns event/validity intervals into coverage facts (q73).
  * Complements the CDC family: q70 emits per-version validity
  * intervals, this collapses them (or any interval table — sessions,
  * maintenance windows, SLA breaches) into their disjoint union.
  */
object Intervals {

  /** MERGE overlapping-or-touching intervals per key (q73): the
    * classic sweep — order a key's intervals by (start, end), track
    * the running max end over PRECEDING rows, open a new merged group
    * exactly when a start exceeds it, then aggregate each group to
    * (min start, max end, row count). Intervals are CLOSED on both
    * ends: `start == previous end` touches and therefore merges
    * (half-open callers pass end-1, or pre-shift, and get strict-
    * overlap semantics).
    *
    * Determinism under full ties, argued once here: rows sharing
    * (start, end) are interchangeable — a same-start row always joins
    * the current group (the previous peer's end ≥ its own start), so
    * the new-group flag multiset, the group boundaries, and every
    * aggregate are identical whatever physical order the peers
    * arrive in. No unique-tiebreak column is needed for the MERGED
    * output (contrast Packing's cumsum, where the per-row running
    * value itself is the answer).
    *
    * Scale shape: ONE hash exchange on the key — the window
    * partitions by key, and the follow-up (key, group) aggregation
    * is satisfied by the same partitioning (partitioning expressions
    * are a subset of the grouping keys), so Catalyst inserts no
    * second shuffle (PlanSpec-pinned). Per-key work is linear in the
    * key's interval count. */
  def mergeOverlapping(df: DataFrame, key: Column, start: Column,
                       end: Column): DataFrame = {
    val wOrd = Window.partitionBy("__k").orderBy(col("__s"), col("__e"))
    val prevMax = max(col("__e")).over(
      wOrd.rowsBetween(Window.unboundedPreceding, -1))
    df.select(key.as("__k"), start.cast("long").as("__s"),
        end.cast("long").as("__e"))
      .withColumn("__ng",
        when(prevMax.isNull || col("__s") > prevMax, 1L).otherwise(0L))
      .withColumn("__grp", sum(col("__ng")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("__k"), col("__grp"))
      .agg(min(col("__s")).as("m_start"), max(col("__e")).as("m_end"),
        count(lit(1)).as("n_merged"))
      .select(col("__k").as("key"), col("m_start"), col("m_end"),
        col("n_merged"))
  }
}
