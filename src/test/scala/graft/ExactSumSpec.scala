package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{dsum, davg, D4}
import graft.functions.Scaled4Util

/** SumScaled4 (the 128-bit primitive-buffer dsum) must be
  * bit-identical to the DECIMAL(27,4)-cast sum it replaced — on real
  * data, on adversarial scale-4 values, across partitionings, and
  * beyond the single-long range where the high limb starts carrying. */
class ExactSumSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private def decSum(c: org.apache.spark.sql.Column) =
    sum(c.cast(D4)).cast(DoubleType)

  test("bit-identical to the decimal-cast sum on lineitem money columns") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val got = li.groupBy("l_returnflag")
      .agg(dsum(col("l_extendedprice")).as("a"),
           dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("b"),
           davg(col("l_quantity")).as("c"))
      .orderBy("l_returnflag").collect()
    val want = li.groupBy("l_returnflag")
      .agg(decSum(col("l_extendedprice")).as("a"),
           decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("b"),
           (decSum(col("l_quantity")) / count(lit(1))).as("c"))
      .orderBy("l_returnflag").collect()
    assert(got.length == want.length && got.length > 0)
    got.zip(want).foreach { case (g, w) =>
      assert(java.lang.Double.doubleToLongBits(g.getDouble(1)) ==
             java.lang.Double.doubleToLongBits(w.getDouble(1)), s"$g vs $w")
      assert(java.lang.Double.doubleToLongBits(g.getDouble(2)) ==
             java.lang.Double.doubleToLongBits(w.getDouble(2)), s"$g vs $w")
      assert(java.lang.Double.doubleToLongBits(g.getDouble(3)) ==
             java.lang.Double.doubleToLongBits(w.getDouble(3)), s"$g vs $w")
    }
  }

  test("adversarial scale-4 values, any partitioning: exact and stable") {
    // values whose DOUBLE sums would differ by addition order
    val vals = Seq(0.0001, -0.0001, 123456789.1234, -987654321.4321,
      0.9999, 1e11 + 0.1234, -(1e11 + 0.1235), 42.0, 7777777.7777)
    val expected = vals.map(v => BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    for (parts <- Seq(1, 3, 9)) {
      val got = vals.toDF("x").repartition(parts)
        .agg(dsum(col("x")).as("s")).collect()(0).getDouble(0)
      assert(java.lang.Double.doubleToLongBits(got) ==
             java.lang.Double.doubleToLongBits(expected), s"parts=$parts: $got")
    }
  }

  test("crosses the single-long range: high limb carries, still exact") {
    // 4000 rows of ~4.5e15 scaled units = ~1.8e19 > 2^63 — a plain
    // long accumulator wraps negative here; the 128-bit one must not
    val big = 450000000000.1234 // scaled: 4500000000001234 < 2^52
    val n = 4000
    val df = spark.range(n).select(lit(big).as("x"))
    val got = df.agg(dsum(col("x")).as("s")).collect()(0).getDouble(0)
    val want = df.agg(decSum(col("x")).as("s")).collect()(0).getDouble(0)
    assert(java.lang.Double.doubleToLongBits(got) ==
           java.lang.Double.doubleToLongBits(want), s"$got vs $want")
    assert(got > 1.7e15, s"sanity: $got") // 4000 * 4.5e11
    // and the negative direction (two's-complement high limb)
    val gotNeg = spark.range(n).select(lit(-big).as("x"))
      .agg(dsum(col("x")).as("s")).collect()(0).getDouble(0)
    assert(java.lang.Double.doubleToLongBits(gotNeg) ==
           java.lang.Double.doubleToLongBits(-got))
  }

  test("mixed-sign cancellation through the carry path") {
    // interleave huge positives and negatives so intermediate sums
    // repeatedly cross zero (lo-limb borrows propagate to hi)
    val vals = (1 to 500).flatMap(i => Seq(450000000000.25, -450000000000.125))
    val got = vals.toDF("x").repartition(7)
      .agg(dsum(col("x")).as("s")).collect()(0).getDouble(0)
    assert(got == 500 * 0.125, s"$got")
  }

  test("SQL SUM null semantics: empty -> null, nulls skipped, NaN -> null row") {
    val e = Seq.empty[Double].toDF("x").agg(dsum(col("x"))).collect()(0)
    assert(e.isNullAt(0))
    val withNulls = Seq(Some(1.5), None, Some(2.5), None).toDF("x")
      .agg(dsum(col("x"))).collect()(0).getDouble(0)
    assert(withNulls == 4.0)
    val allNull = Seq[Option[Double]](None, None).toDF("x")
      .agg(dsum(col("x"))).collect()(0)
    assert(allNull.isNullAt(0))
    // NaN casts to null decimal in the old form — same here
    val nan = Seq(1.0, Double.NaN, 2.0).toDF("x")
      .agg(dsum(col("x"))).collect()(0).getDouble(0)
    assert(nan == 3.0)
  }

  test("contract violation throws loudly instead of losing digits") {
    // beyond the signed-long scaled range (~9.2e14): the decimal cast
    // would admit this and NULL silently past 1e23; dsum refuses
    val ex = intercept[Exception] {
      Seq(1e15).toDF("x").agg(dsum(col("x"))).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(_.isInstanceOf[ArithmeticException]), ex.toString)
  }

  test("toScaled: the rint fast path agrees with the BigDecimal slow " +
      "path across a 1M-value randomized sweep of every regime " +
      "(money-shaped, fast-window, beyond-window, non-scale-4, tiny)") {
    val rnd = new scala.util.Random(42)
    def ref(d: Double): Long = java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
    val gens: Seq[() => Double] = Seq(
      () => (rnd.nextLong() % 2500000000000000L) / 1e4, // inside fast window
      () => (rnd.nextLong() % 9000000000000000L) / 1e4, // crosses the bound
      () => rnd.nextDouble() * 2e-4 - 1e-4,             // rounding boundary zone
      () => rnd.nextDouble() * 6e11 - 3e11,             // non-scale-4, near cutoff
      () => rnd.nextInt(2000000) / 100.0)               // the money shape
    for (g <- gens; _ <- 1 to 200000) {
      val d = g()
      assert(Scaled4Util.toScaled(d) === ref(d), s"disagree at $d")
    }
  }

  test("Scaled4Util.toDouble: wide path == BigDecimal reference") {
    // exercise the BigInteger reconstruction against a direct model
    val cases = Seq(
      (0L, 123450000L), (-1L, -1L), (1L, 0L), (5L, Long.MinValue),
      (-3L, Long.MaxValue), (123L, -456L))
    for ((hi, lo) <- cases) {
      val bi = java.math.BigInteger.valueOf(hi).shiftLeft(64)
        .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
      val want = new java.math.BigDecimal(bi, 4).doubleValue()
      assert(Scaled4Util.toDouble(hi, lo) == want, s"($hi,$lo)")
    }
  }

  test("property: dsum == BigDecimal reference on arbitrary scale-4 " +
      "inputs under arbitrary partitioning (signs, nulls, magnitudes " +
      "up to the long-crossing range)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // scale-4 values as exact longs up to ~4.5e11 in magnitude — big
    // enough that a few hundred rows cross the single-long scaled
    // range, exercising the hi limb in both directions
    val value: Gen[Option[Double]] = Gen.frequency(
      6 -> Gen.choose(-4500000000000000L, 4500000000000000L)
        .map(v => Some(v / 1e4)),
      2 -> Gen.choose(-99999999L, 99999999L).map(v => Some(v / 1e4)),
      1 -> Gen.const(None))
    val prop = Prop.forAll(Gen.listOf(value), Gen.choose(1, 8)) {
      (vs, parts) =>
        val want: Option[Double] = {
          val present = vs.flatten
          if (present.isEmpty) None
          else Some(present.map(v =>
            BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP))
            .sum.toDouble)
        }
        val row = vs.toDF("x").repartition(parts)
          .agg(dsum(col("x"))).collect()(0)
        val got = if (row.isNullAt(0)) None else Some(row.getDouble(0))
        got.map(java.lang.Double.doubleToLongBits) ==
          want.map(java.lang.Double.doubleToLongBits)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20).withWorkers(1),
      prop)
    assert(res.passed, res.status.toString)
  }

  test("q03's aggregate stays a codegen HashAggregate (primitive buffer)") {
    val df = SparkEntry.queries("q03_agg_groupby")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("ObjectHashAggregate"), plan)
  }
}
