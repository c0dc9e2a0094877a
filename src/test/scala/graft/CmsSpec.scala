package graft

import org.apache.spark.sql.functions._
import graft.functions.{CmsFunctions, RollingHashFunctions}

/** Count-Min sketch (q44): matrix determinism under repartitioning,
  * the estimate >= exact guarantee over EVERY key, forced collisions
  * at tiny widths, loud failure on out-of-range hashes, and the
  * partial→final ObjectHashAggregate plan. */
class CmsSpec extends TestSpark {
  import spark.implicits._

  private def tokenHashes = Tables(spark, sfDir, "documents")
    .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
    .filter(col("tok") =!= "")
    .withColumn("h", RollingHashFunctions.fingerprint(col("tok")) % 2147483647L)

  test("cms matrix bytes are identical under any partitioning") {
    def bytesOf(parts: Int) = tokenHashes.repartition(parts, col("h"))
      .agg(CmsFunctions.cmsAgg(col("h")).as("m")).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(bytesOf(1), bytesOf(7)))
  }

  test("estimate >= exact for every token; equal when width is ample") {
    val cms = tokenHashes.agg(CmsFunctions.cmsAgg(col("h")).as("__cms"))
    val exact = tokenHashes.groupBy("tok", "h").agg(count(lit(1)).as("n"))
    val rows = exact.crossJoin(broadcast(cms))
      .select(col("tok"), col("n"),
        CmsFunctions.cmsEstimate(col("__cms"), col("h")).as("est"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, n, est) => est >= n },
      rows.filter { case (_, n, est) => est < n }.take(5).mkString(", "))
    // ~45 distinct tokens into width 1024 x depth 3: no collision on
    // all three rows — estimates are exact on this corpus
    assert(rows.forall { case (_, n, est) => est === n })
  }

  test("tiny width forces collisions: estimates inflate, never deflate") {
    val cms = tokenHashes
      .agg(CmsFunctions.cmsAgg(col("h"), depth = 2, width = 4).as("__cms"))
    val exact = tokenHashes.groupBy("tok", "h").agg(count(lit(1)).as("n"))
    val rows = exact.crossJoin(broadcast(cms))
      .select(col("n"),
        CmsFunctions.cmsEstimate(col("__cms"), col("h"), depth = 2, width = 4)
          .as("est"))
      .as[(Long, Long)].collect()
    assert(rows.forall { case (n, est) => est >= n })
    assert(rows.exists { case (n, est) => est > n })
  }

  test("out-of-range hash input fails loudly") {
    val e = intercept[Exception] {
      Seq(1L, 2147483647L).toDF("h")
        .agg(CmsFunctions.cmsAgg(col("h"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("outside")), e)
  }

  test("q44 plan: sketch is a partial→final ObjectHashAggregate — the " +
       "shuffle carries one fixed-size matrix per partition") {
    val p = SparkEntry.queries("q44_cms_freq")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_cms_sketch"), p)
  }
}
