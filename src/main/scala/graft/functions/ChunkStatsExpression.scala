package graft.functions

import java.math.{BigDecimal => JBD}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Per-group (count, Σv, Σv², last-k rows) in ONE aggregate — the
  * fused statistics pass of q81's chunked rolling gauge.
  *
  * The gauge needs two things per (type, ts-chunk): exact decimal
  * count/Σv/Σv² (to turn chunk-local running sums into global prefix
  * sums) and the chunk's LAST k rows in (ts, id) order (whose suffix
  * sums let the next chunk's head rows reconstruct their 101-back
  * carry without a second corpus shuffle). As two jobs those are two
  * full fact scans; fused here they are one map-side-combined
  * ObjectHashAggregate — each task's partial carries three scalars
  * plus at most k rows, so the shuffle is chunk-count-sized, never
  * data-sized, and the same holds at 100 TB.
  *
  * The tail buffer keeps the k LARGEST (ts, id) keys (a TreeMap —
  * O(log k) per row); merging keeps the k largest of the union, which
  * is scan-order-independent by construction, so partials compose
  * under any partitioning. Decimal sums are exact in any order. */
case class ChunkStatsTail(tsl: Expression, id: Expression,
    v4: Expression, vv4: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ChunkTailBuf] {

  override def children: Seq[Expression] = Seq(tsl, id, v4, vv4)

  override def createAggregationBuffer(): ChunkTailBuf = new ChunkTailBuf(k)

  override def update(buf: ChunkTailBuf, input: InternalRow): ChunkTailBuf = {
    val t = tsl.eval(input)
    val i = id.eval(input)
    val a = v4.eval(input)
    val b = vv4.eval(input)
    if (t == null || i == null || a == null || b == null)
      throw new IllegalArgumentException(
        "chunk_stats_tail: null input row — the gauge's columns are " +
          "non-null by contract; a null here means a corrupt source")
    buf.add(t.asInstanceOf[Long], i.asInstanceOf[Long],
      a.asInstanceOf[Decimal].toJavaBigDecimal,
      b.asInstanceOf[Decimal].toJavaBigDecimal)
    buf
  }

  override def merge(b1: ChunkTailBuf, b2: ChunkTailBuf): ChunkTailBuf = {
    b1.absorb(b2); b1
  }

  override def eval(buf: ChunkTailBuf): Any = {
    val arr = buf.tail.toSeq.map { case ((t, i), (a, b)) =>
      InternalRow(t, i, Decimal(a), Decimal(b))
    }
    InternalRow(buf.n, Decimal(buf.sx), Decimal(buf.sxx),
      new GenericArrayData(arr))
  }

  override def serialize(buf: ChunkTailBuf): Array[Byte] = {
    def dec(s: JBD): Array[Byte] = s.toString.getBytes(UTF_8)
    val sx = dec(buf.sx); val sxx = dec(buf.sxx)
    val tails = buf.tail.toSeq.map { case ((t, i), (a, b)) =>
      (t, i, dec(a), dec(b))
    }
    val sz = 8 + 4 + sx.length + 4 + sxx.length + 4 +
      tails.map(e => 16 + 4 + e._3.length + 4 + e._4.length).sum
    val bb = ByteBuffer.allocate(sz)
    bb.putLong(buf.n)
    bb.putInt(sx.length); bb.put(sx)
    bb.putInt(sxx.length); bb.put(sxx)
    bb.putInt(tails.size)
    tails.foreach { case (t, i, a, b) =>
      bb.putLong(t); bb.putLong(i)
      bb.putInt(a.length); bb.put(a)
      bb.putInt(b.length); bb.put(b)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ChunkTailBuf = {
    val bb = ByteBuffer.wrap(bytes)
    def dec(): JBD = {
      val n = bb.getInt; val a = new Array[Byte](n); bb.get(a)
      new JBD(new String(a, UTF_8))
    }
    val buf = new ChunkTailBuf(k)
    buf.n = bb.getLong
    buf.sx = dec(); buf.sxx = dec()
    val m = bb.getInt
    var j = 0
    while (j < m) {
      val t = bb.getLong; val i = bb.getLong
      buf.tail((t, i)) = (dec(), dec())
      j += 1
    }
    buf
  }

  override def dataType: DataType = ChunkStatsTail.outType
  override def nullable: Boolean = false
  override def prettyName: String = "chunk_stats_tail"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"chunk_stats_tail k must be >= 1, got $k")
    else (tsl.dataType, id.dataType, v4.dataType, vv4.dataType) match {
      case (LongType, LongType, _: DecimalType, _: DecimalType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"chunk_stats_tail needs (BIGINT, BIGINT, DECIMAL, DECIMAL), got $other")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): ChunkStatsTail =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ChunkStatsTail =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChunkStatsTail =
    copy(tsl = newChildren(0), id = newChildren(1),
      v4 = newChildren(2), vv4 = newChildren(3))
}

object ChunkStatsTail {
  val outType: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sx", DecimalType(38, 4), nullable = false),
    StructField("sxx", DecimalType(38, 4), nullable = false),
    StructField("tail", ArrayType(StructType(Seq(
      StructField("tsl", LongType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("v4", DecimalType(38, 4), nullable = false),
      StructField("vv4", DecimalType(38, 4), nullable = false))),
      containsNull = false), nullable = false)))
}

/** [[ChunkStatsTail]]'s mutable buffer: exact decimal sums + the k
  * largest-(ts, id) rows. */
final class ChunkTailBuf(k: Int) {
  var n: Long = 0L
  var sx: JBD = JBD.ZERO
  var sxx: JBD = JBD.ZERO
  val tail: mutable.TreeMap[(Long, Long), (JBD, JBD)] =
    mutable.TreeMap.empty[(Long, Long), (JBD, JBD)]

  // (ts, id) uniqueness is a DECLARED contract, enforced loudly: a
  // duplicate key would silently overwrite its tail slot while n
  // counts both rows, corrupting the carry suffix sums downstream
  // (round-13 advisory). Detection is tail-scoped — a duplicate below
  // the current tail threshold never lands in the map — but that is
  // exactly the set whose corruption would matter: rows outside the
  // tail only feed the order-free decimal sums, where duplicates are
  // counted, not collapsed.
  private def dup(t: Long, i: Long): Nothing =
    throw new IllegalArgumentException(
      s"chunk_stats_tail: duplicate (ts, id) key ($t, $i) — the id " +
        "column must be unique per row (q81 feeds event_id); a " +
        "duplicate would corrupt the tail's suffix sums")

  def add(t: Long, i: Long, a: JBD, b: JBD): Unit = {
    n += 1L
    sx = sx.add(a); sxx = sxx.add(b)
    if (tail.size < k || Ordering[(Long, Long)].gt((t, i), tail.firstKey)) {
      if (tail.contains((t, i))) dup(t, i)
      tail((t, i)) = (a, b)
      if (tail.size > k) tail -= tail.firstKey
    }
  }

  def absorb(o: ChunkTailBuf): Unit = {
    n += o.n
    sx = sx.add(o.sx); sxx = sxx.add(o.sxx)
    o.tail.foreach { case (key, v) =>
      if (tail.size < k || Ordering[(Long, Long)].gt(key, tail.firstKey)) {
        if (tail.contains(key)) dup(key._1, key._2)
        tail(key) = v
        if (tail.size > k) tail -= tail.firstKey
      }
    }
  }
}

object ChunkStatsFunctions {
  /** One fused pass: struct(n, sx, sxx, tail[last-k rows ascending]). */
  def chunkStatsTail(tsl: Column, id: Column, v4: Column, vv4: Column,
                     k: Int): Column =
    GraftInternal.column(ChunkStatsTail(
      GraftInternal.expression(tsl), GraftInternal.expression(id),
      GraftInternal.expression(v4), GraftInternal.expression(vv4), k)
      .toAggregateExpression())
}
