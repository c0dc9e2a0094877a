package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Exact deterministic SUM over scale-4 "money" doubles, the engine's
  * `dsum` workhorse (see `graft.queries.dsum`).
  *
  * WHY NOT `sum(CAST(x AS DECIMAL(27,4)))`: the decimal sum's buffer
  * is DECIMAL(37,4) — far above Spark's compact-long precision bound
  * (18) — so every partial add allocates a BigDecimal and the
  * aggregate falls off the primitive-buffer path. Measured on the
  * sf10 q03 shape (60M rows, 4 sums): decimal 5.3 s vs plain long
  * sums 0.9 s — ~1.2 s PER SUM COLUMN of pure BigDecimal churn,
  * ~90% of the whole query. And why not `sum(CAST(x*10⁴ AS LONG))`:
  * a single long wraps silently at ~10¹⁹ — reachable by a 100 TB
  * aggregate over money columns (10¹¹ rows × 10⁸ scaled units/row).
  *
  * THIS aggregate keeps per-row values as exact scale-4 longs and
  * accumulates them in a SIGNED 128-BIT integer held as two LongType
  * buffer slots (hi, lo) — a primitive, fixed-width UnsafeRow buffer
  * that stays inside whole-stage codegen. All carry arithmetic is
  * plain Catalyst bitwise expressions (this is a DeclarativeAggregate,
  * not an ImperativeAggregate, so hash aggregation never leaves the
  * vectorized path). Overflow is structurally impossible: the row
  * domain bound (|x| < 2⁵²/10⁴) caps one row's contribution at 2⁵²,
  * so 2¹²⁷ absorbs ~10²¹ rows of worst-case input — ~10 000× the
  * 100 TB table. The final value reconstructs through the SAME
  * java.math.BigDecimal.doubleValue() conversion Spark's decimal→
  * double cast uses, so results are bit-identical to the decimal
  * form (and to the DuckDB oracle's VARCHAR-hop cast) — the sf0.01
  * gate re-ran hash-green over every dsum query after the switch.
  *
  * Determinism contract (same as the decimal form): the per-row
  * conversion is the decimal cast's own shortest-decimal HALF_UP
  * rounding (see [[Scaled4Util.toScaled]]), the sum is exact integer
  * arithmetic — identical under any partitioning, any merge order,
  * any engine. Rows beyond the signed-long scaled range throw
  * LOUDLY; NaN/Infinity become NULL exactly like the decimal cast
  * they replace. */
case class DoubleToScaled4(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "scaled4"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"scaled4 needs double, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val d = input.asInstanceOf[Double]
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) null
    else Scaled4Util.toScaled(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if (Double.isNaN($c) || Double.isInfinite($c)) { ${ev.isNull} = true; }
      else { ${ev.value} = graft.functions.Scaled4Util.toScaled($c); }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Scaled4Util {
  /** Per-row value as an exact scale-4 long, with EXACTLY the decimal
    * cast's semantics: BigDecimal.valueOf resolves the double via its
    * SHORTEST decimal representation, then HALF_UP at scale 4 — the
    * same two steps as `CAST(x AS DECIMAL(27,4))` in Spark and in the
    * DuckDB oracle. A float-side shortcut (rint(x·10⁴)) is NOT
    * equivalent: a ScalaCheck sweep falsified it at 16-significant-
    * digit inputs, where the shortest decimal of the nearest double
    * differs from the binary value's rounding — rint rounds the
    * binary expansion, the cast rounds the shortest decimal. The
    * BigDecimal hop costs ~100 ns/row; the aggregate's win lives in
    * the PRIMITIVE 128-bit buffer (the decimal form paid BigDecimal
    * allocation per row AND per buffer add AND per merge).
    *
    * Values whose scaled form exceeds a signed long (|x| ≳ 9.2·10¹⁴)
    * throw LOUDLY — the decimal cast silently admitted up to 10²³ and
    * overflowed to NULL past that; a money column nearing 10¹⁵ per
    * row deserves an explicit decimal pipeline, not silence. */
  /** Fast-path window: for |x| below 2.5·10¹¹, ulp(x) < 3.1·10⁻⁵ —
    * strictly under half the scale-4 step (5·10⁻⁵). Then if the
    * candidate integer r = rint(x·10⁴) ROUND-TRIPS (fl(r/10⁴) == x),
    * the shortest decimal s of x and r/10⁴ both lie within one ulp of
    * x, so |s − r/10⁴| < 5·10⁻⁵ and s rounds HALF_UP at scale 4 to
    * exactly r — the slow path's answer, provably, with no BigDecimal
    * and no Double.toString. Every real money/quantity value lands
    * here; a 16-digit or non-scale-4 double fails the round-trip
    * check (or the magnitude bound) and takes the exact slow path.
    * The skew pair measured why this matters: the per-row
    * Double.toString, amplified through q48's single hot reducer over
    * 1.5G joined rows, was 356 s vs 65 s — the conversion cost IS
    * hot-path cost. */
  private val FastScaledBound = 2.5e15 // = 2.5e11 * 1e4

  def toScaled(d: Double): Long = {
    val scaled = d * 1.0e4
    if (scaled < FastScaledBound && scaled > -FastScaledBound) {
      val r = java.lang.Math.rint(scaled)
      if (r / 1.0e4 == d) return r.toLong
    }
    try java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
    catch { case _: ArithmeticException =>
      throw new ArithmeticException(
        s"dsum: |$d| x 10^4 exceeds the signed-long per-row bound " +
          "(~9.2e14) — aggregate this column through an explicit " +
          "DECIMAL cast instead")
    }
  }

  /** (hi, lo) signed-128 scaled-by-10⁴ → double, through the same
    * BigDecimal.doubleValue() as Spark's decimal→double cast (bit-
    * identical to the DECIMAL(27,4) sum this aggregate replaces). */
  def toDouble(hi: Long, lo: Long): Double =
    if (hi == (lo >> 63)) // fits in one signed long
      java.math.BigDecimal.valueOf(lo, 4).doubleValue()
    else {
      val unsignedLo = java.math.BigInteger.valueOf(lo >>> 1).shiftLeft(1)
        .or(java.math.BigInteger.valueOf(lo & 1L))
      val v = java.math.BigInteger.valueOf(hi).shiftLeft(64).add(unsignedLo)
      new java.math.BigDecimal(v, 4).doubleValue()
    }
}

/** Final reconstruction (hi, lo) → double; runs once per GROUP, so
  * the BigDecimal hop here is off the per-row path by construction. */
case class Scaled128ToDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "scaled128_to_double"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"scaled128_to_double needs (long, long), got $other")
    }

  override protected def nullSafeEval(hi: Any, lo: Any): Any =
    Scaled4Util.toDouble(hi.asInstanceOf[Long], lo.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hi, lo) =>
      s"${ev.value} = graft.functions.Scaled4Util.toDouble($hi, $lo);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The aggregate itself. Buffer = (hi: long, lo: long, seen: bool);
  * empty group → NULL like SQL SUM. */
case class SumScaled4(child: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dsum needs double, got ${other.simpleString}")
  }

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  /** 128-bit add of a sign-extended 64-bit addend `s` to (h, l):
    * newLo = l + s (wrapping); the unsigned carry-out of that add is
    * ((l & s) | ((l | s) & ~newLo)) >>> 63 (standard carry identity);
    * newHi = h + (s >> 63) + carry (arithmetic shift sign-extends the
    * addend to its high limb). */
  private def add128(h: Expression, l: Expression, s: Expression)
      : (Expression, Expression) = {
    // EvalMode.LEGACY: the lo-limb add MUST wrap (that is the carry
    // scheme); ANSI (Spark 4's default) would throw on exactly the
    // inputs the 128-bit buffer exists for
    val newLo = Add(l, s, EvalMode.LEGACY)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(l, s), BitwiseAnd(BitwiseOr(l, s), BitwiseNot(newLo))),
      Literal(63))
    val newHi = Add(Add(h, ShiftRight(s, Literal(63)), EvalMode.LEGACY), carry,
      EvalMode.LEGACY)
    (newHi, newLo)
  }

  /** 128-bit add of two (hi, lo) pairs — same carry identity, but the
    * second high limb is a real limb, not a sign extension. */
  private def add128Wide(h1: Expression, l1: Expression,
                         h2: Expression, l2: Expression)
      : (Expression, Expression) = {
    val newLo = Add(l1, l2, EvalMode.LEGACY)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(l1, l2), BitwiseAnd(BitwiseOr(l1, l2), BitwiseNot(newLo))),
      Literal(63))
    val newHi = Add(Add(h1, h2, EvalMode.LEGACY), carry, EvalMode.LEGACY)
    (newHi, newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val s = DoubleToScaled4(child)
    val (nh, nl) = add128(hi, lo, Coalesce(Seq(s, Literal(0L))))
    // null input: Coalesce adds 0 (hi/lo unchanged bit-for-bit), and
    // `seen` only flips on a non-null row — SQL SUM's null semantics
    // without branching the buffer writes
    Seq(nh, nl, Or(seen, IsNotNull(s)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (nh, nl) = add128Wide(hi.left, lo.left, hi.right, lo.right)
    Seq(nh, nl, Or(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression =
    If(seen, Scaled128ToDouble(hi, lo), Literal(null, DoubleType))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object ExactSumFunctions {
  /** Column face of [[SumScaled4]]. */
  def sumScaled4(c: Column): Column =
    GraftInternal.column(
      SumScaled4(GraftInternal.expression(c)).toAggregateExpression())
}
