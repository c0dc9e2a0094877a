package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Distributed global prefix sum (Packing.globalRunningSum): must
  * reproduce the single-reducer global window exactly, stay invariant
  * under input partitioning, and keep the fact-side window
  * bucket-PARTITIONED (the whole point — only the nBuckets-row offsets
  * aggregate may see an empty partition spec).
  */
class PackingSpec extends TestSpark {
  import spark.implicits._

  // deterministic corpus: unique ids, md5 ordering key (so the
  // first-hex-char bucket is a prefix of the order by construction),
  // weights 1..100
  private def corpus(n: Int) = {
    val rnd = new scala.util.Random(42)
    (1 to n).map { i =>
      (i.toLong, s"doc $i ${rnd.alphanumeric.take(8).mkString}", 1L + rnd.nextInt(100))
    }.toDF("id", "txt", "w").withColumn("h", md5(col("txt")))
  }

  private def fast(df: org.apache.spark.sql.DataFrame) =
    Packing.globalRunningSum(df,
      bucket = substring(col("h"), 1, 1),
      ordCols = Seq(col("h"), col("id")),
      weight = col("w"),
      outCol = "cum")

  test("two-phase prefix sum == single-reducer global window") {
    val docs = corpus(500)
    val naive = docs.withColumn("cum",
      sum("w").over(Window.orderBy(col("h"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val got = fast(docs).select("id", "cum").as[(Long, Long)].collect().toMap
    val want = naive.select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got == want)
    // the last row's running total is the corpus total
    assert(got.values.max == docs.agg(sum("w")).as[Long].head())
  }

  test("result is invariant under input partitioning") {
    val docs = corpus(300)
    val a = fast(docs).select("id", "cum").as[(Long, Long)].collect().toMap
    val b = fast(docs.repartition(7)).select("id", "cum").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("fact-side window is bucket-partitioned; offsets broadcast back") {
    val p = fast(corpus(100)).queryExecution.executedPlan.toString
    // the window over the full corpus carries the bucket partition spec
    assert(p.contains("windowspecdefinition(__gps_bucket"), p)
    // offsets come back as a broadcast join, not a fact shuffle
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q53 gated entry: shard boundaries respect the token budget") {
    val out = SparkEntry.queries("q53_shard_pack")(spark, sfDir)
      .select("n_tokens", "cum_tokens", "shard_id")
      .as[(Long, Long, Long)].collect()
    // shard id is the 1024-token bucket of the doc's STARTING offset
    out.foreach { case (n, cum, sid) => assert(sid == (cum - n) / 1024) }
    // cumulative totals are consistent: max cum == sum of weights
    assert(out.map(_._2).max == out.map(_._1).sum)
  }
}
