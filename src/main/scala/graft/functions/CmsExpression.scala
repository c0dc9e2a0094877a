package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Count-Min Sketch over a hash column as a first-class AGGREGATE:
  * `depth × width` long counters; each input increments one counter
  * per row (position = ((a_j·h + b_j) mod P) mod width), partial
  * sketches merge by element-wise ADDITION, and the final value is the
  * serialized counter matrix (BinaryType).
  *
  * Like [[KmvSketch]] and [[BloomSketch]], the sketch is approximate
  * in ACCURACY but deterministic in VALUE: counter increments are
  * commutative sums over fixed positions, so the matrix — and every
  * estimate read from it — is bit-identical under any partitioning,
  * and a DuckDB oracle reproduces it as a grouped COUNT over the same
  * positions. Point estimates ([[CmsEstimate]]) are
  * `min_j counters[j][pos_j(h)]` — always >= the true count, equal
  * when no collision lands on all rows.
  *
  * Scale shape: the full frequency TABLE of a 100 TB corpus doesn't
  * fit anywhere, but depth·width·8 bytes does — the shuffle carries
  * one fixed-size matrix per partition (partial → final
  * ObjectHashAggregate), and the result broadcasts to wherever
  * frequencies are probed. Inputs must already be reduced to [0, P).
  */
case class CmsSketch(child: Expression, depth: Int, width: Int, seed: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  @transient private lazy val (permA, permB) =
    MinHashSignature.perms(depth, seed)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (h < 0L || h >= BloomUtil.P)
        throw new IllegalArgumentException(
          s"cms_sketch input hash $h outside [0, ${BloomUtil.P}) — feed " +
            "it a value already reduced mod the Mersenne prime")
      var j = 0
      while (j < depth) {
        val pos = (((permA(j) * h + permB(j)) % BloomUtil.P) % width).toInt
        buf(j * width + pos) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (depth < 1 || width < 2)
      TypeCheckResult.TypeCheckFailure(
        s"cms_sketch needs depth >= 1 and width >= 2, got ($depth, $width)")
    else if (depth.toLong * width > (1L << 27))
      // counter matrix is depth·width longs; bound it at analysis time
      // (2^27 longs = 1 GiB) instead of overflowing Int in the buffer
      // allocation and dying with an inscrutable executor error
      TypeCheckResult.TypeCheckFailure(
        s"cms_sketch depth*width = ${depth.toLong * width} exceeds 2^27 " +
          "counters (1 GiB) — use a narrower sketch")
    else child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cms_sketch needs a BIGINT hash column, got ${other.simpleString}")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketch =
    copy(child = newChild)
}

/** Point-frequency estimate from a broadcast [[CmsSketch]] matrix:
  * `min_j counters[j][pos_j(h)]`. Row-local, stays in whole-stage
  * codegen (constants ride along as codegen references). */
case class CmsEstimate(left: Expression, right: Expression,
    depth: Int, width: Int, seed: Long) extends BinaryExpression {

  @transient private lazy val (permA, permB) =
    MinHashSignature.perms(depth, seed)

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate needs (binary, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(sketch: Any, hash: Any): Any =
    CmsUtil.estimate(sketch.asInstanceOf[Array[Byte]],
      hash.asInstanceOf[Long], permA, permB, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("cmsA", permA, "long[]")
    val bRef = ctx.addReferenceObj("cmsB", permB, "long[]")
    nullSafeCodeGen(ctx, ev, (sk, h) =>
      s"${ev.value} = graft.functions.CmsUtil.estimate($sk, $h, " +
        s"$aRef, $bRef, $width);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** JOIN-SIZE estimate from two Count-Min sketches (q64): for each of
  * the `depth` rows, the dot product Σ_pos cA·cB; the minimum over
  * rows estimates Σ_k fA(k)·fB(k) — the inner-join row count — from
  * two fixed-size summaries, never touching the join (Alon-Gibbons-
  * Matias-Szegedy by way of Cormode-Muthukrishnan). Never
  * underestimates (hash collisions only add mass), so as a
  * broadcast/salt planning signal it is conservative the safe way.
  * Integer arithmetic only: both engines replay the estimate exactly,
  * collision inflation included. */
case class CmsJoinSize(left: Expression, right: Expression,
                       depth: Int, width: Int) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_join_size"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_join_size needs (binary, binary), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CmsUtil.joinSizeEst(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]], depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CmsUtil.joinSizeEst($a, $b, $depth, $width);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CmsUtil {
  /** Static (codegen-callable) join-size core: per sketch row, the
    * integer dot product of the two count vectors; min over rows.
    * Both matrices must share (depth, width) — and, for the estimate
    * to mean anything, the same hash seed. Overflow is ENFORCED, not
    * just documented: Σ cA·cB over `width` cells fits a long with
    * room while both inputs stay under ~10⁹ rows, but past that (a
    * maximally hot key on both sides) a wrapped product would go
    * NEGATIVE and win the min-over-rows — the unsafe direction for a
    * never-underestimates planning signal. Each term uses
    * multiplyHigh to detect 128-bit overflow and the sum uses a
    * checked add; either saturates the row to Long.MaxValue, so an
    * overflowing estimate reads as "at least 2⁶³", which keeps the
    * one-sided guarantee. */
  def joinSizeEst(sa: Array[Byte], sb: Array[Byte],
                  depth: Int, width: Int): Long = {
    val need = depth * width * 8
    if (sa.length != need || sb.length != need)
      throw new IllegalArgumentException(
        s"cms_join_size: sketches have ${sa.length}/${sb.length} bytes " +
          s"but depth=$depth width=$width needs $need — both sides must " +
          "be built with the probe's parameters")
    def at(s: Array[Byte], off: Int): Long = {
      var c = 0L; var i = 0
      while (i < 8) { c = (c << 8) | (s(off + i) & 0xffL); i += 1 }
      c
    }
    var best = Long.MaxValue
    var j = 0
    while (j < depth) {
      var dot = 0L
      var p = 0
      var saturated = false
      while (p < width && !saturated) {
        val off = (j * width + p) * 8
        val a = at(sa, off)
        val b = at(sb, off)
        // counts are non-negative; the product overflows long iff the
        // high 64 bits are non-zero OR it lands in [2^63, 2^64) where
        // multiplyHigh still reads 0 but the signed low word flips
        // negative; the sum overflows iff the checked add throws
        val prod = a * b
        if (java.lang.Math.multiplyHigh(a, b) != 0L || prod < 0L)
          saturated = true
        else {
          try dot = java.lang.Math.addExact(dot, prod)
          catch { case _: ArithmeticException => saturated = true }
        }
        p += 1
      }
      if (!saturated && dot < best) best = dot
      j += 1
    }
    best
  }

  /** Static (codegen-callable) estimate core: read one big-endian long
    * per sketch row, take the min. Validates like the build side —
    * an out-of-range probe hash or a sketch/parameter mismatch would
    * otherwise read the wrong counters silently. */
  def estimate(sketch: Array[Byte], h: Long,
               a: Array[Long], b: Array[Long], width: Int): Long = {
    if (sketch.length != a.length * width * 8)
      throw new IllegalArgumentException(
        s"cms_estimate: sketch has ${sketch.length} bytes but " +
          s"depth=${a.length} width=$width needs ${a.length * width * 8} — " +
          "probe parameters must match the sketch's")
    if (h < 0L || h >= BloomUtil.P)
      throw new IllegalArgumentException(
        s"cms_estimate probe hash $h outside [0, ${BloomUtil.P}) — feed " +
          "it a value already reduced mod the Mersenne prime")
    var best = Long.MaxValue
    var j = 0
    while (j < a.length) {
      val pos = (((a(j) * h + b(j)) % BloomUtil.P) % width).toInt
      val off = (j * width + pos) * 8
      var c = 0L
      var i = 0
      while (i < 8) { c = (c << 8) | (sketch(off + i) & 0xffL); i += 1 }
      if (c < best) best = c
      j += 1
    }
    best
  }

  /** Total increments recorded by the sketch — every row sums all
    * inserts, so row 0's cell sum IS the exact input count (the
    * denominator the adaptive Bloom-join selectivity rule divides
    * by). */
  def totalCount(sketch: Array[Byte], depth: Int, width: Int): Long = {
    if (sketch.length != depth * width * 8)
      throw new IllegalArgumentException(
        s"cms_total: sketch has ${sketch.length} bytes but depth=$depth " +
          s"width=$width needs ${depth * width * 8}")
    var sum = 0L
    var p = 0
    while (p < width) {
      val off = p * 8
      var c = 0L
      var i = 0
      while (i < 8) { c = (c << 8) | (sketch(off + i) & 0xffL); i += 1 }
      sum += c
      p += 1
    }
    sum
  }
}

object CmsFunctions {
  /** [[CmsSketch]] as a Column aggregate (use inside `agg(...)`). */
  def cmsAgg(hash: Column, depth: Int = 3, width: Int = 1024,
             seed: Long = 42L): Column =
    GraftInternal.column(
      CmsSketch(GraftInternal.expression(hash), depth, width, seed)
        .toAggregateExpression())

  /** [[CmsEstimate]] as a Column. */
  def cmsEstimate(sketch: Column, hash: Column, depth: Int = 3,
                  width: Int = 1024, seed: Long = 42L): Column =
    GraftInternal.column(CmsEstimate(
      GraftInternal.expression(sketch), GraftInternal.expression(hash),
      depth, width, seed))

  /** [[CmsJoinSize]] as a Column. */
  def cmsJoinSize(a: Column, b: Column, depth: Int = 3,
                  width: Int = 1024): Column =
    GraftInternal.column(CmsJoinSize(
      GraftInternal.expression(a), GraftInternal.expression(b),
      depth, width))
}
