package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.functions.{ScaledLongFunctions, ScaledLongUtil}

/** The round-10 dsum fast path (functions/ScaledLongExpression.scala):
  * scaled_long4 must be bit-identical to CAST(x AS DECIMAL(27,4)) —
  * every gated query's hash rides on it — and the compact DECIMAL(18,0)
  * sum must escalate exactly past the long range instead of wrapping.
  */
class ScaledSumSpec extends TestSpark {
  import spark.implicits._

  test("scaled_long4 == unscaled CAST(x AS DECIMAL(27,4)) on adversarial " +
      "doubles (shortest-repr ties, >4dp products, negatives, powers of 2)") {
    val vals = Seq(0.0, -0.0, 0.1, -0.1, 0.00005, -0.00005, 0.000049999,
      1.0 / 3.0, 2.0 / 3.0, 123456.789, -123456.789, 0.07 * 0.81,
      95000.5 * 0.93, 1e10 + 0.12345, -1e10 - 0.12345, 8.1, 8.1 * 10000,
      math.pow(2, 40) + 0.5, -math.pow(2, 40) - 0.5, 4.9999500001,
      0.12344999999999999, Double.MinPositiveValue)
    val df = vals.toDF("x")
    val got = df.select(ScaledLongFunctions.scaledLong4(col("x")))
      .as[Long].collect().toSeq
    val want = df.select((col("x").cast(DecimalType(27, 4)) * 10000)
        .cast("long")).as[Long].collect().toSeq
    assert(got === want, vals.zip(got.zip(want)).toString)
    // NaN / Infinity: null, matching the non-ANSI decimal cast
    val nulls = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity).toDF("x")
      .select(ScaledLongFunctions.scaledLong4(col("x"))).collect()
    assert(nulls.forall(_.isNullAt(0)))
    // domain violation is LOUD, not a silent decimal-overflow null
    intercept[ArithmeticException] {
      ScaledLongUtil.toScaledLong4(1e15)
    }
  }

  test("dsum == the decimal-cast sum it replaced, on real data and " +
      ">4-decimal-digit product expressions") {
    val li = Tables(spark, sfDir, "lineitem")
    def old(c: org.apache.spark.sql.Column) =
      sum(c.cast(DecimalType(27, 4))).cast(DoubleType)
    val exprs = Seq(
      col("l_quantity"),
      col("l_extendedprice"),
      col("l_extendedprice") * (lit(1) - col("l_discount")))
    exprs.foreach { e =>
      val a = li.groupBy("l_returnflag").agg(queries.dsum(e).as("s"))
        .orderBy("l_returnflag").as[(String, Double)].collect().toSeq
      val b = li.groupBy("l_returnflag").agg(old(e).as("s"))
        .orderBy("l_returnflag").as[(String, Double)].collect().toSeq
      assert(a === b)
    }
  }

  test("the compact DECIMAL(18,0) sum escalates exactly past the long " +
      "range — no silent wrap (the 100 TB accumulator bound)") {
    val df = Seq.fill(20)(900000000000000000L).toDF("v").repartition(3)
    // 20 x 9e17 = 1.8e19 > Long.MaxValue
    val s = df.agg(sum(col("v").cast(DecimalType(18, 0)))).head()
    assert(s.getDecimal(0).toBigInteger.toString ===
      "18000000000000000000")
  }
}
