package graft

import org.apache.spark.sql.functions._
import graft.operators.Quantiles

/** Histogram quantiles (q46): the estimate brackets the exact
  * rank-based percentile within one bucket width, is deterministic
  * under repartitioning, and costs one histogram shuffle. */
class QuantilesSpec extends TestSpark {
  import spark.implicits._

  test("estimate brackets the exact percentile within one bucket width") {
    val width = 1000L
    val li = Tables(spark, sfDir, "lineitem")
    val est = Quantiles.histogramQuantiles(li, col("l_returnflag"),
        col("l_extendedprice"), width)
      .as[(String, Int, Long)].collect()
      .map { case (g, p, e) => (g, p) -> e }.toMap
    val byGroup = li.select(col("l_returnflag"), col("l_extendedprice"))
      .as[(String, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    for (((g, p), e) <- est) {
      val vs = byGroup(g)
      // p-th ranked value: first index where cum*100 >= p*total
      val exact = vs((vs.length * p + 99) / 100 - 1)
      assert(e <= exact && exact < e + width,
        s"group $g p$p: est $e does not bracket exact $exact")
    }
    assert(est.size === byGroup.size * 3)
  }

  test("estimates are identical under any partitioning") {
    val li = Tables(spark, sfDir, "lineitem")
    def run(df: org.apache.spark.sql.DataFrame) =
      Quantiles.histogramQuantiles(df, col("l_returnflag"),
        col("l_extendedprice"), 500L, Seq(25, 50, 75))
        .as[(String, Int, Long)].collect().sorted.toSeq
    assert(run(li) === run(li.repartition(13, col("l_orderkey"))))
  }

  test("q46 plan: one partial+final histogram aggregation feeds the quantile read") {
    val p = SparkEntry.queries("q46_histogram_quantile")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_count"), p) // map-side combine on (g, bucket)
  }

  test("globalTopFraction selects exactly the naive window's top-k, " +
      "boundary ties trimmed by the tie column") {
    // 10 rows score 5 (ids 0..9), 7 rows score 3 (ids 10..16),
    // 13 rows score 1 (ids 20..32): N = 30, k = N/3 = 10 + boundary?
    // k = 10 -> all score-5 rows, none of score 3.
    val rows = (0L to 9L).map((_, 5L)) ++ (10L to 16L).map((_, 3L)) ++
      (20L to 32L).map((_, 1L))
    val df = rows.toDF("id", "score")
    def sel(num: Long, den: Long) =
      Quantiles.globalTopFraction(df, col("score"), col("id"), num, den)
        .select("id").as[Long].collect().toSet
    assert(sel(1, 3) === (0L to 9L).toSet)
    // k = 30*2/5 = 12 -> all ten 5s + the two LOWEST ids of the 3s
    assert(sel(2, 5) === (0L to 9L).toSet ++ Set(10L, 11L))
    // degenerate: every row the same score -> pure tie trim by id
    val flat = (0L until 20L).map((_, 7L)).toDF("id", "score")
    val got = Quantiles.globalTopFraction(flat, col("score"), col("id"),
      1, 4).select("id").as[Long].collect().toSet
    assert(got === (0L until 5L).toSet)
    // equals the naive global window on a shuffled corpus
    val shuffled = df.repartition(7)
    val naive = df.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= 10).select("id").as[Long].collect().toSet
    assert(Quantiles.globalTopFraction(shuffled, col("score"), col("id"),
      1, 3).select("id").as[Long].collect().toSet === naive)
    // staged-scores variant is the same selection (it only changes
    // whether the score column is materialized or recomputed)
    assert(Quantiles.globalTopFraction(shuffled, col("score"), col("id"),
      1, 3, stageScores = true).select("id").as[Long].collect().toSet === naive)
  }
}
