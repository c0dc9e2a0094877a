package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** q61's fan-out semantics on hand corpora: the bounded explode of
  * deduped (user, bucket) pairs must equal brute-force per-window
  * COUNT DISTINCT. */
class SlidingDistinctSpec extends TestSpark {
  import spark.implicits._

  private def slidingDistinct(events: org.apache.spark.sql.DataFrame) =
    events
      .select(col("user_id"), expr("unix_timestamp(ts) div 600").as("b"))
      .distinct()
      .select(col("user_id"), col("b"),
        explode(expr("sequence(0, 5)")).as("i"))
      .select(col("user_id"), ((col("b") - col("i")) * 600).as("w_start"))
      .distinct()
      .groupBy("w_start")
      .agg(count(lit(1)).as("n_users"))

  test("a single event lands in exactly its 6 covering windows") {
    val ev = Seq((7L, new Timestamp(7200L * 1000))).toDF("user_id", "ts")
    val got = slidingDistinct(ev).orderBy("w_start")
      .as[(Long, Long)].collect().toSeq
    // bucket 12; windows start at (12-i)*600 for i in 0..5
    assert(got === (7 to 12).map(k => (k * 600L, 1L)).toSeq)
  }

  test("window counts equal brute-force per-window COUNT DISTINCT") {
    // 3 users, events spread over ~3 hours incl. duplicates in-bucket
    val rows = Seq(
      (1L, 0L), (1L, 30L), (1L, 3700L), (2L, 550L), (2L, 4100L),
      (3L, 7300L), (1L, 7300L), (3L, 7350L))
      .map { case (u, t) => (u, new Timestamp(t * 1000)) }
    val ev = rows.toDF("user_id", "ts")
    val got = slidingDistinct(ev)
      .as[(Long, Long)].collect().toMap
    // brute force: every window start that contains >= 1 event
    val times = rows.map { case (u, t) => (u, t.getTime / 1000) }
    val starts = times.map(_._2 / 600).flatMap(b => (b - 5) to b).distinct
    for (w <- starts) {
      val want = times.filter { case (_, t) =>
        t >= w * 600 && t < w * 600 + 3600 }.map(_._1).distinct.size.toLong
      assert(got(w * 600) === want, s"window ${w * 600}")
    }
    assert(got.keySet === starts.map(_ * 600L).toSet)
  }
}
