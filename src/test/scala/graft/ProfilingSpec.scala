package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.queries.{D4, Profiling}

/** Laws for the q75-q78 profiling/statistics family — each checked on
  * constructed data where the right answer is known by hand, plus the
  * partitioning-invariance property every gated entry already relies
  * on at the four gate layouts.
  */
class ProfilingSpec extends TestSpark {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q75: profile counts nulls and exact distincts per column") {
    val out = q("q75_column_profile").collect()
    assert(out.length === 3)
    assert(out.map(_.getString(0)).toSeq ===
      Seq("l_discount", "l_extendedprice", "l_quantity"))
    val li = Tables(spark, sfDir, "lineitem")
    val n = li.count()
    for (r <- out) {
      assert(r.getLong(1) === n, "n_rows is the table row count")
      val c = r.getString(0)
      assert(r.getLong(2) === li.filter(col(c).isNull).count())
      assert(r.getLong(3) ===
        li.select(c).distinct().na.drop().count(), s"$c distinct")
    }
  }

  test("q76: a perfect line recovers slope/intercept/r2 EXACTLY " +
       "(the algebraic sums are integer-exact through the decimal lift)") {
    // y = 3x + 2 over x = 1..100, two groups interleaved
    val df = (1 to 100).map(i =>
      (if (i % 2 == 0) "A" else "B", i.toDouble, 3.0 * i + 2.0))
      .toDF("g", "x", "y").repartition(7)
    val a = df.groupBy("g")
      .agg(count(lit(1)).cast("double").as("n"),
        graft.queries.dsum(col("x")).as("sx"),
        graft.queries.dsum(col("y")).as("sy"),
        graft.queries.dsum(col("x") * col("y")).as("sxy"),
        graft.queries.dsum(col("x") * col("x")).as("sxx"),
        graft.queries.dsum(col("y") * col("y")).as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val deny = col("n") * col("syy") - col("sy") * col("sy")
    val rows = a.select(col("g"), (num / den).as("slope"),
        ((col("sy") - (num / den) * col("sx")) / col("n")).as("intercept"),
        ((num * num) / (den * deny)).as("r2"))
      .collect()
    for (r <- rows) {
      assert(r.getDouble(1) === 3.0, s"slope ${r}")
      assert(r.getDouble(2) === 2.0, s"intercept ${r}")
      assert(r.getDouble(3) === 1.0, s"r2 ${r}")
    }
  }

  test("q76 gate: regression output is invariant to input partitioning") {
    val a = q("q76_group_linregress").collect().toSeq
    val b = q("q76_group_linregress").collect().toSeq // plan re-run
    assert(a === b)
    assert(a.forall(r => r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0),
      s"r2 in [0,1]: $a")
  }

  test("q77: a hole in the calendar materializes as a zero row and the " +
       "grid covers exactly types x days") {
    def ts(day: Int) = Timestamp.valueOf(f"2024-03-$day%02d 10:00:00")
    // type a: days 1,2,4 (hole at 3); type b: only day 2 —
    // grid must cover 1..4 for BOTH types
    val ev = Seq(("a", ts(1), 1.0), ("a", ts(2), 2.0), ("a", ts(4), 4.0),
        ("b", ts(2), 8.0))
      .toDF("event_type", "ts", "value").repartition(5)
    val agg = ev.groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"), graft.queries.dsum(col("value")).as("sv"))
    val days = agg.agg(min("day").as("mn"), max("day").as("mx"))
      .select(explode(sequence(col("mn"), col("mx"),
        expr("interval 1 day"))).as("day"))
    val keys = agg.select("event_type").distinct()
    val filled = keys.crossJoin(days)
      .join(agg, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        coalesce(col("sv"), lit(0.0)).as("sv"))
      .orderBy("event_type", "day")
      .collect()
    assert(filled.length === 8, "2 types x 4 days")
    val zero = filled.filter(_.getLong(2) == 0L)
    assert(zero.length === 4, s"a@3 plus b@{1,3,4}: ${zero.toSeq}")
    assert(filled.map(_.getDouble(3)).sum === 15.0, "fills add nothing")
  }

  test("q78: weighted median law — smallest value whose cumulative " +
       "weight reaches half, heavy tail wins over row majority") {
    // 9 rows of value 1.0 at weight 1 vs ONE row of value 9.0 at
    // weight 11: total 20, half 10, cum(1.0)=9 < 10 -> median 9.0.
    // The unweighted median of the same rows is 1.0 — the law is
    // about weight, not row count.
    val df = ((1 to 9).map(_ => (1.0, 1.0)) :+ (9.0, 11.0))
      .toDF("v", "w").repartition(4)
    val perv = df.groupBy("v").agg(sum(col("w").cast(D4)).as("w"))
    val cum = org.apache.spark.sql.expressions.Window.orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tot = df.agg(sum(col("w").cast(D4))).head().getDecimal(0)
    val med = perv.withColumn("cum", sum("w").over(cum))
      .filter(col("cum") * 2 >= lit(tot))
      .agg(min("v")).head().getDouble(0)
    assert(med === 9.0)
    // unit weights degenerate to the plain lower median
    val uni = (1 to 5).map(i => (i.toDouble, 1.0)).toDF("v", "w")
    val perv2 = uni.groupBy("v").agg(sum(col("w").cast(D4)).as("w"))
    val med2 = perv2.withColumn("cum", sum("w").over(cum))
      .filter(col("cum") * 2 >= lit(5).cast(D4))
      .agg(min("v")).head().getDouble(0)
    assert(med2 === 3.0)
  }

  test("q78 gate: the weighted median is a value from the table and at " +
       "most half the group weight sits strictly below it") {
    val li = Tables(spark, sfDir, "lineitem")
    for (r <- q("q78_weighted_median").collect()) {
      val (g, m) = (r.getString(0), r.getDouble(1))
      val below = li.filter(col("l_returnflag") === g &&
          col("l_extendedprice") < m)
        .agg(coalesce(sum(col("l_quantity").cast(D4)), lit(0).cast(D4)))
        .head().getDecimal(0)
      val total = li.filter(col("l_returnflag") === g)
        .agg(sum(col("l_quantity").cast(D4))).head().getDecimal(0)
      assert(below.multiply(java.math.BigDecimal.valueOf(2))
        .compareTo(total) < 0, s"$g: below=$below total=$total")
      assert(li.filter(col("l_returnflag") === g &&
        col("l_extendedprice") === m).count() > 0, s"$g median $m in table")
    }
  }
}
