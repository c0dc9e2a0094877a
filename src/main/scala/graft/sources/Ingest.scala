package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Load-time key integrity — the engine's analogue of the reference's
  * `CREATE UNIQUE INDEX idx_service_name` (/root/reference/src/main.rs:
  * 189-190), where a duplicate-key import fails the load.
  *
  * Graft checks with ONE hash aggregation over the key (map-side
  * partial counts — the same scale shape as exact dedup, no index
  * needed), then either fails with a sample of the offending keys or
  * dedups deterministically and reports what was dropped.
  */
object Ingest {

  final case class DuplicateKeysException(nKeys: Long, sample: Seq[String])
      extends RuntimeException(
        s"unique-key violation: $nKeys duplicated key value(s), " +
          s"e.g. [${sample.mkString(", ")}]")

  private def dupKeys(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .select(concat_ws("|",
        keyCols.map(c => col(c).cast("string")): _*).as("k"))

  /** Fail (like the reference's unique index) if `keyCols` are not
    * unique; returns `df` unchanged otherwise. The happy path costs a
    * single aggregation job. */
  def assertUnique(df: DataFrame, keyCols: Seq[String],
                   sampleSize: Int = 5): DataFrame = {
    val dups = dupKeys(df, keyCols)
    val n = dups.count()
    if (n > 0) {
      val sample = dups.orderBy("k").take(sampleSize).map(_.getString(0)).toSeq
      throw DuplicateKeysException(n, sample)
    }
    df
  }

  /** Dedup-with-report alternative: keep the min-`tieBreak` row per key
    * (deterministic winner) and return how many rows were dropped.
    * The report costs ONE aggregation job — dropped = total rows minus
    * distinct keys, since the dedup keeps exactly one row per key —
    * and the returned frame stays lazy. */
  def uniqueOrDedup(df: DataFrame, keyCols: Seq[String],
                    tieBreak: Column): (DataFrame, Long) = {
    val key = struct(keyCols.map(col): _*)
    val counts = df.agg(
      count(lit(1)).as("total"), count_distinct(key).as("keys")).head()
    val deduped = graft.operators.Dedup.exact(df, key, tieBreak)
    (deduped, counts.getLong(0) - counts.getLong(1))
  }
}
