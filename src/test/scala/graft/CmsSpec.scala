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

  test("cms_join_size: exact when collision-free, never underestimates " +
      "when cells collide, symmetric") {
    // side A: key 1 x 3, key 2 x 2; side B: key 1 x 4, key 3 x 5.
    // true join size = 3*4 = 12. width 64 -> no collisions -> exact.
    val a = Seq.fill(3)(1L) ++ Seq.fill(2)(2L)
    val b = Seq.fill(4)(1L) ++ Seq.fill(5)(3L)
    def sketch(xs: Seq[Long], w: Int) = xs.toDF("h")
      .agg(CmsFunctions.cmsAgg(col("h"), depth = 3, width = w))
      .head().getAs[Array[Byte]](0)
    def est(w: Int) = graft.functions.CmsUtil.joinSizeEst(
      sketch(a, w), sketch(b, w), 3, w)
    assert(est(64) === 12L)
    // symmetric
    assert(graft.functions.CmsUtil.joinSizeEst(
      sketch(b, 64), sketch(a, 64), 3, 64) === 12L)
    // width 2 forces collisions: estimate inflates, never deflates
    assert(est(2) >= 12L)
    // mismatched geometry fails loudly
    val e = intercept[IllegalArgumentException] {
      graft.functions.CmsUtil.joinSizeEst(sketch(a, 64), sketch(b, 32), 3, 64)
    }
    assert(e.getMessage.contains("both sides"))
  }

  test("cms_join_size saturates to Long.MaxValue on 64-bit overflow — " +
      "a wrapped dot product can never win the min") {
    // hand-built sketches (big-endian longs, the aggregate's layout):
    // counts beyond ~10^9 on a shared hot cell overflow the per-cell
    // product; pre-guard the wrapped negative would beat every honest
    // row in the min and the planner would read a huge join as tiny
    def enc(rows: Seq[Seq[Long]]): Array[Byte] = {
      val out = new Array[Byte](rows.map(_.size).sum * 8)
      var k = 0
      rows.flatten.foreach { v =>
        var i = 7
        var x = v
        while (i >= 0) { out(k + i) = (x & 0xff).toByte; x >>>= 8; i -= 1 }
        k += 8
      }
      out
    }
    // depth 2, width 2. row 0: hot-cell product 2^32*2^32 = 2^64
    // (overflows even multiplyHigh's low-word check); row 1 honest: 7*3
    val sa = enc(Seq(Seq(1L << 32, 0L), Seq(7L, 0L)))
    val sb = enc(Seq(Seq(1L << 32, 0L), Seq(3L, 0L)))
    assert(graft.functions.CmsUtil.joinSizeEst(sa, sb, 2, 2) === 21L)
    // product in [2^63, 2^64): multiplyHigh reads 0 but the signed low
    // word flips negative — still detected, row saturates
    val sc = enc(Seq(Seq(3037000500L, 0L)))   // ~2^31.5; square ~2^63.03
    assert(graft.functions.CmsUtil.joinSizeEst(sc, sc, 1, 2)
      === Long.MaxValue)
    // sum overflow across cells saturates too
    val sd = enc(Seq(Seq(1L << 31, 1L << 31)))
    val se = enc(Seq(Seq((1L << 32) - 1, (1L << 32) - 1)))
    // each product ~2^62.99; the second add overflows the accumulator
    assert(graft.functions.CmsUtil.joinSizeEst(sd, se, 1, 2)
      === Long.MaxValue)
  }
}
