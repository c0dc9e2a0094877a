package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.D4

/** q54's algebraic-merge property: snapshot + delta re-aggregation is
  * bit-identical to the full recompute for ANY cutoff — including
  * cutoffs that split a day across the two partitions, the case a
  * "recompute only complete days" shortcut would get wrong.
  */
class RollupSpec extends TestSpark {
  import spark.implicits._

  private def ts(day: Int, h: Int) =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  private def events = Seq(
    (1L, ts(1, 3), "a", 1.25), (2L, ts(1, 9), "a", 2.5),
    (3L, ts(1, 9), "b", 0.75), (4L, ts(2, 0), "a", 4.0),
    (5L, ts(2, 12), "b", 1.1), (6L, ts(3, 23), "a", 0.004)
  ).toDF("event_id", "ts", "event_type", "value")

  private def rollup(df: DataFrame) = df
    .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
    .agg(count(lit(1)).as("cnt"), sum(col("value").cast(D4)).as("sv"))

  private def merged(cutoff: Timestamp) =
    rollup(events.filter(col("ts") < lit(cutoff)))
      .unionByName(rollup(events.filter(col("ts") >= lit(cutoff))))
      .groupBy("day", "event_type")
      .agg(sum("cnt").as("cnt"), sum("sv").cast("double").as("sum_value"))
      .orderBy("day", "event_type")
      .collect().toSeq

  test("snapshot+delta merge == full recompute for every cutoff, " +
       "including mid-day splits") {
    val full = rollup(events)
      .select(col("day"), col("event_type"), col("cnt"),
        col("sv").cast("double").as("sum_value"))
      .orderBy("day", "event_type").collect().toSeq
    // cutoffs: before everything, mid-day-1 (splits day 1), a day
    // boundary, mid-day-2, after everything
    for (c <- Seq(ts(1, 0), ts(1, 9), ts(2, 0), ts(2, 5), ts(4, 0)))
      assert(merged(c) === full, s"cutoff $c diverged")
  }

  test("an empty delta (cutoff past the data) degenerates to the snapshot") {
    assert(merged(ts(31, 0)).map(_.getLong(2)).sum === 6L)
  }
}
