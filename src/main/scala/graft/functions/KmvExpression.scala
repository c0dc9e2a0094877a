package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** k-minimum-values distinct-count sketch as a first-class AGGREGATE:
  * each partition keeps only the k smallest distinct hash values seen
  * (an O(k) buffer), partial buffers merge by keeping the k smallest
  * of the union, and the final estimate is `(k-1)·P div h_(k)` — or
  * the EXACT count when fewer than k distinct hashes exist.
  *
  * This is the scale-correct formulation of q43: the composed
  * `distinct → window-rank ≤ k` version shuffles every distinct
  * (group, key) row; this one shuffles AT MOST k longs per group per
  * partition (classic map-side combine, ObjectHashAggregate partial →
  * final). The estimate is identical by construction — the k smallest
  * distinct values of a set do not depend on how the set is scanned —
  * so the DuckDB oracle (which sorts the distinct hashes) keeps
  * matching bit-for-bit. Feed it an INJECTIVE hash (a linear map mod
  * the Mersenne prime is injective for keys < P) and there is no
  * collision term at all. */
case class KmvSketch(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  override def update(buf: mutable.TreeSet[Long],
                      input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // the estimator divides P by h_(k): a hash outside [0, P) (e.g. a
      // raw xxhash64) would yield a silently negative "count" or a
      // divide-by-zero — fail loudly at the first bad row instead
      if (h < 0L || h >= KmvSketch.P)
        throw new IllegalArgumentException(
          s"kmv_sketch input hash $h outside [0, ${KmvSketch.P}) — feed " +
            "it a value already reduced mod the Mersenne prime (e.g. " +
            "(affine(key)) % 2147483647 composed with x^5 mod P)")
      if (buf.size < k) buf += h
      else if (h < buf.last) { buf += h; if (buf.size > k) buf -= buf.last }
    }
    buf
  }

  override def merge(b1: mutable.TreeSet[Long],
                     b2: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b2.foreach { h =>
      if (b1.size < k) b1 += h
      else if (h < b1.last) { b1 += h; if (b1.size > k) b1 -= b1.last }
    }
    b1
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    if (buf.size < k) buf.size.toLong // exact below the sketch size
    else (k - 1).toLong * KmvSketch.P / buf.last

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 2)
      TypeCheckResult.TypeCheckFailure(s"kmv_sketch k must be >= 2, got $k")
    else child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch needs a BIGINT hash column, got ${other.simpleString}")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketch {
  val P = 2147483647L // 2^31 - 1
}

/** [[KmvSketch]]'s buffer materialized as VALUES (sorted ascending
  * array of the k smallest distinct hashes) instead of the scalar
  * estimate — the mergeable-summary face q58's set algebra composes
  * on. Same O(k) buffer, same map-side-combine shuffle shape (at most
  * k longs per group per partition); only `eval` differs. The
  * composed `distinct → window-rank ≤ k` formulation shuffles EVERY
  * distinct (group, element) row — corpus-sized; this shuffles
  * buffers. */
case class KmvSketchValues(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with UnaryLike[Expression] {

  private val inner = KmvSketch(child, k)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    inner.createAggregationBuffer()
  override def update(buf: mutable.TreeSet[Long],
                      input: InternalRow): mutable.TreeSet[Long] =
    inner.update(buf, input)
  override def merge(b1: mutable.TreeSet[Long],
                     b2: mutable.TreeSet[Long]): mutable.TreeSet[Long] =
    inner.merge(b1, b2)
  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] =
    inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] =
    inner.deserialize(bytes)

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.toArray)

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch_values"

  override def checkInputDataTypes(): TypeCheckResult =
    inner.checkInputDataTypes()

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchValues =
    copy(child = newChild)
}

object KmvFunctions {
  /** [[KmvSketch]] as a Column aggregate (use inside `agg(...)`). */
  def kmvDistinct(hash: Column, k: Int = 256): Column =
    GraftInternal.column(
      KmvSketch(GraftInternal.expression(hash), k).toAggregateExpression())

  /** [[KmvSketchValues]] as a Column aggregate: the sketch itself. */
  def kmvValues(hash: Column, k: Int = 256): Column =
    GraftInternal.column(
      KmvSketchValues(GraftInternal.expression(hash), k).toAggregateExpression())
}
