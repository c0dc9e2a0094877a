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
}
