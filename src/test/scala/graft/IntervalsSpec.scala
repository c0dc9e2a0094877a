package graft

import org.apache.spark.sql.functions._
import graft.operators.Intervals

/** Interval union (operators/Intervals.scala): merge semantics on a
  * known fixture, the touching-endpoints rule, tie determinism, and
  * the coverage law vs raw span sums.
  */
class IntervalsSpec extends TestSpark {
  import spark.implicits._

  test("mergeOverlapping: overlap and touch merge, gaps split, counts " +
      "and bounds exact on a known fixture") {
    val iv = Seq(
      (1L, 0L, 10L),   // ┐ overlap → one group [0, 15] of 3
      (1L, 5L, 12L),   // │
      (1L, 12L, 15L),  // ┘ touching (start == prev end) merges
      (1L, 17L, 20L),  // gap → own group
      (2L, 3L, 4L))    // other key untouched
      .toDF("k", "s", "e")
    val out = Intervals.mergeOverlapping(iv, col("k"), col("s"), col("e"))
      .orderBy("key", "m_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 0L, 15L, 3L),
      (1L, 17L, 20L, 1L),
      (2L, 3L, 4L, 1L)))
  }

  test("mergeOverlapping: duplicate (start, end) peers are order-" +
      "insensitive and nested intervals stay inside their cover") {
    val iv = Seq((1L, 0L, 20L), (1L, 2L, 5L), (1L, 2L, 5L), (1L, 19L, 25L))
      .toDF("k", "s", "e")
    val a = Intervals.mergeOverlapping(iv, col("k"), col("s"), col("e"))
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val b = Intervals.mergeOverlapping(iv.repartition(5), col("k"),
      col("s"), col("e")).as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(a === b)
    assert(a === Seq((1L, 0L, 25L, 4L)))
  }

  test("merged output is disjoint per key and covers every input " +
      "point (law on real orders-derived intervals)") {
    val iv = Tables(spark, sfDir, "orders").select(
      col("o_custkey").as("k"),
      datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("s"),
      (datediff(col("o_orderdate"), lit("1992-01-01")) +
        col("o_orderkey") % 30).cast("long").as("e"))
    val merged = Intervals.mergeOverlapping(iv, col("k"), col("s"), col("e"))
    // disjoint AND non-touching: within a key, next m_start > prev m_end
    val overlaps = merged.withColumn("prev_end",
        lag("m_end", 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("key").orderBy("m_start")))
      .filter(col("prev_end").isNotNull && col("m_start") <= col("prev_end"))
    assert(overlaps.count() === 0L)
    // every input interval lies inside some merged one
    val uncovered = iv.as("i").join(merged.as("m"),
        col("i.k") === col("m.key") && col("i.s") >= col("m.m_start") &&
          col("i.e") <= col("m.m_end"), "left_anti")
    assert(uncovered.count() === 0L)
    // merged count per key never exceeds input count
    assert(merged.count() <= iv.count())
  }
}
