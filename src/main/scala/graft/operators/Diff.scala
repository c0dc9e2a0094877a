package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot DIFF — derive a change stream (insert/update/delete rows)
  * from two table snapshots, the CDC shape every incremental pipeline
  * (q54's rollup maintenance, d10's incremental dedup) consumes when
  * the upstream system only publishes full dumps.
  *
  * ONE co-partitioned full-outer join on the key; the row comparison
  * is null-safe column equality evaluated row-locally inside the join
  * (no fingerprint hashing: a cross-engine row hash would have to
  * canonicalize double/timestamp formatting, while `IS DISTINCT
  * FROM` compares the VALUES and is exact in both engines). At
  * 100 TB both snapshots shuffle once on the key — the cost class of
  * any join — and bucketed snapshot storage makes even that exchange
  * disappear (BucketSpec's zero-Exchange join applies verbatim).
  */
object Diff {

  /** Rows of `nu` not matching `old` → `insert`; rows of `old` gone
    * from `nu` → `delete`; shared keys whose non-key columns differ
    * anywhere (null-safe) → `update`. Unchanged rows are dropped
    * BEFORE the result leaves the join — the output is change-sized,
    * not snapshot-sized. Key columns must be non-null and unique per
    * snapshot (the primary-key contract CDC requires anyway). */
  def snapshotDiff(old: DataFrame, nu: DataFrame,
                   keys: Seq[String]): DataFrame = {
    require(old.columns.sameElements(nu.columns),
      s"snapshot schemas differ: ${old.columns.toSeq} vs ${nu.columns.toSeq}")
    val cmp = old.columns.filterNot(keys.contains).toSeq
    val a = old.as("a")
    val b = nu.as("b")
    val keyCond = keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _)
    val hasA = col(s"a.${keys.head}").isNotNull
    val hasB = col(s"b.${keys.head}").isNotNull
    val changed = cmp.map(c => !(col(s"a.$c") <=> col(s"b.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    a.join(b, keyCond, "full_outer")
      .select(
        keys.map(k => coalesce(col(s"a.$k"), col(s"b.$k")).as(k)) :+
          when(!hasA, lit("insert"))
            .when(!hasB, lit("delete"))
            .when(changed, lit("update"))
            .otherwise(lit("unchanged")).as("status"): _*)
      .filter(col("status") =!= "unchanged")
  }
}
