package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.{AsofJoin, RangeJoin}

/** Property-based equivalence: the scalable formulations of the custom
  * join operators must agree with their naive O(n·m) definitions on
  * arbitrary keyed/timestamped data (duplicate times, empty keys,
  * boundary hits included by construction). */
class JoinPropertySpec extends TestSpark {

  private def check(p: Prop, minSuccessful: Int = 15): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful)
        .withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }
  import spark.implicits._

  private val row = for {
    k <- Gen.oneOf("a", "b", "c")
    t <- Gen.choose(0L, 50L)
  } yield (k, t)
  private val rows = Gen.listOfN(30, row).map(_.zipWithIndex
    .map { case ((k, t), i) => (k, t, i.toLong) })

  test("range join equals the naive inequality join on random data") {
    check(Prop.forAll(rows, rows, Gen.choose(1L, 25L)) { (ls, rs, w) =>
      val left = ls.toDF("k", "t", "lid")
      val right = rs.toDF("k2", "t2", "rid")
      val got = RangeJoin(left, col("k"), col("t"),
          right, col("k2"), col("t2"), w)
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      val want = ls.flatMap { case (k, t, lid) =>
        rs.collect { case (k2, t2, rid) if k2 == k && t2 >= t && t2 < t + w =>
          (lid, rid) }
      }.toSet
      got == want
    })
  }

  test("banded interval join equals the plain interval join on the events table") {
    import org.apache.spark.sql.functions._
    val events = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"),
        date_trunc("second", col("ts")).as("ts"))
    val plain = graft.streaming.Streams.intervalJoin(events, windowSec = 3600)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val banded = graft.streaming.Streams
      .intervalJoinBanded(events, windowSec = 3600)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded === plain)
    assert(banded.nonEmpty)
  }

  test("pigeonhole hamming join equals the brute-force pair scan on " +
       "random fingerprints") {
    // fingerprints clustered around a few centers so near pairs exist:
    // center XOR a random few-bit mask
    val center = Gen.oneOf(0x0123456789abcdefL, -1L, 0L, 0x5555aaaa5555aaaaL)
    val fp = for {
      c <- center
      nFlip <- Gen.choose(0, 5)
      bits <- Gen.listOfN(nFlip, Gen.choose(0, 63))
    } yield bits.foldLeft(c)((v, b) => v ^ (1L << b))
    val fps = Gen.listOfN(25, fp).map(_.zipWithIndex
      .map { case (f, i) => (i.toLong, f) })
    check(Prop.forAll(fps, Gen.oneOf(1, 3, 7)) { (rows, maxDist) =>
      val got = graft.operators.Dedup
        .hamming64Pairs(rows.toDF("id", "fp"), maxDist)
        .select("id_a", "id_b", "hamming")
        .as[(Long, Long, Int)].collect().toSet
      val want = (for {
        (ia, fa) <- rows; (ib, fb) <- rows if ia < ib
        d = java.lang.Long.bitCount(fa ^ fb) if d <= maxDist
      } yield (ia, ib, d)).toSet
      got == want
    }, minSuccessful = 10)
  }

  test("asof join equals the naive latest-at-or-before lookup on random data") {
    check(Prop.forAll(rows, rows) { (ls, rs) =>
      val left = ls.toDF("k", "t", "lid")
      // unique (key, time) on the right via max-id tie-break — the
      // operator resolves the same way via rightTieBreak
      val right = rs.toDF("k2", "t2", "rid")
      val got = AsofJoin(left, col("k"), col("t"),
          right, col("k2"), col("t2"), Seq("rid"),
          rightTieBreak = Seq(col("rid")))
        .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
      val want = ls.map { case (k, t, lid) =>
        val cand = rs.filter { case (k2, t2, _) => k2 == k && t2 <= t }
        lid -> (if (cand.isEmpty) None
                else Some(cand.maxBy(r => (r._2, r._3))._3))
      }.toMap
      got == want
    })
  }
}
