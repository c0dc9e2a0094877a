package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Bloom filter over a hash column as a first-class AGGREGATE: each
  * partition sets `numHashes` bits per input into an `mBits`-bit
  * array, partial buffers merge by bitwise OR, and the final value is
  * the raw bit array (BinaryType).
  *
  * Determinism by construction: OR is commutative and associative and
  * each input's bit positions depend only on its hash value, so the
  * resulting bytes are IDENTICAL under any partitioning or scan order
  * — the membership side (and the DuckDB oracle, which simulates the
  * same positions as a distinct set) can be checked bit-for-bit.
  *
  * Scale shape: this is the sketch a decontamination pass broadcasts.
  * The benchmark side — however many eval suites — compresses to
  * mBits/8 bytes (128 KiB at the default 2^20) regardless of row
  * count, the shuffle carries one buffer per partition, and the
  * corpus-side membership test is row-local against the broadcast
  * bytes: the 100 TB corpus is scanned once and never shuffled.
  *
  * Bit positions: pos_j(h) = ((a_j·h + b_j) mod P) mod mBits with
  * P = 2^31-1 and (a_j, b_j) from the shared seeded LCG
  * ([[MinHashSignature.perms]]) — the same constants the oracle-SQL
  * builders embed as literals. Inputs must already be reduced to
  * [0, P) (the [[HashedShingles]] default), keeping a_j·h < 2^62:
  * no overflow under ANSI mode.
  */
case class BloomSketch(child: Expression, mBits: Int, numHashes: Int,
    seed: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  @transient private lazy val (permA, permB) =
    MinHashSignature.perms(numHashes, seed)

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](mBits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (h < 0L || h >= BloomUtil.P)
        throw new IllegalArgumentException(
          s"bloom_sketch input hash $h outside [0, ${BloomUtil.P}) — feed " +
            "it a value already reduced mod the Mersenne prime")
      var j = 0
      while (j < numHashes) {
        val pos = (((permA(j) * h + permB(j)) % BloomUtil.P) % mBits).toInt
        buf(pos >> 3) = (buf(pos >> 3) | (1 << (pos & 7))).toByte
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b1.length) { b1(i) = (b1(i) | b2(i)).toByte; i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (mBits < 64 || (mBits & (mBits - 1)) != 0 || (mBits & 7) != 0)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_sketch mBits must be a power of two >= 64, got $mBits")
    else if (numHashes < 1)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_sketch numHashes must be >= 1, got $numHashes")
    else child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_sketch needs a BIGINT hash column, got ${other.simpleString}")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomSketch =
    copy(child = newChild)
}

/** Membership side of [[BloomSketch]]: given the broadcast bit array
  * and a document's (distinct) shingle-hash array, count how many
  * hashes MIGHT be in the set — all `numHashes` bit positions set.
  * Row-local, one fused loop, stays inside whole-stage codegen (the
  * constant arrays ride along as codegen references). */
case class BloomHitCount(left: Expression, right: Expression,
    mBits: Int, numHashes: Int, seed: Long)
  extends BinaryExpression with BinaryLike[Expression] {

  @transient private lazy val (permA, permB) =
    MinHashSignature.perms(numHashes, seed)

  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_hit_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_hit_count needs (binary, array<bigint>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(bits: Any, hashes: Any): Any =
    BloomUtil.hitCount(bits.asInstanceOf[Array[Byte]],
      hashes.asInstanceOf[ArrayData], permA, permB, mBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bloomA", permA, "long[]")
    val bRef = ctx.addReferenceObj("bloomB", permB, "long[]")
    nullSafeCodeGen(ctx, ev, (bits, hs) =>
      s"${ev.value} = graft.functions.BloomUtil.hitCount($bits, $hs, " +
        s"$aRef, $bRef, $mBits);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomUtil {
  final val P = 2147483647L // 2^31 - 1

  /** Static (codegen-callable) membership core. Validates like the
    * build side: a probe hash outside [0, P) (raw xxhash64: negative
    * position crash or silent Long overflow) and a bits/mBits mismatch
    * (positions mod the wrong modulus: silent FALSE NEGATIVES, the one
    * error class a Bloom filter must never have) both fail loudly. */
  def hitCount(bits: Array[Byte], hashes: ArrayData,
               a: Array[Long], b: Array[Long], mBits: Int): Long = {
    if (bits.length * 8 != mBits)
      throw new IllegalArgumentException(
        s"bloom_hit_count: bit array has ${bits.length * 8} bits but " +
          s"mBits=$mBits — probe parameters must match the sketch's")
    val n = hashes.numElements()
    var hits = 0L
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      if (h < 0L || h >= P)
        throw new IllegalArgumentException(
          s"bloom_hit_count probe hash $h outside [0, $P) — feed it a " +
            "value already reduced mod the Mersenne prime")
      var j = 0
      var all = true
      while (all && j < a.length) {
        val pos = (((a(j) * h + b(j)) % P) % mBits).toInt
        all = (bits(pos >> 3) & (1 << (pos & 7))) != 0
        j += 1
      }
      if (all) hits += 1
      i += 1
    }
    hits
  }
}

object BloomFunctions {
  /** [[BloomSketch]] as a Column aggregate (use inside `agg(...)`). */
  def bloomAgg(hash: Column, mBits: Int = 1 << 20, numHashes: Int = 3,
               seed: Long = 42L): Column =
    GraftInternal.column(
      BloomSketch(GraftInternal.expression(hash), mBits, numHashes, seed)
        .toAggregateExpression())

  /** [[BloomHitCount]] as a Column. */
  def bloomHitCount(bits: Column, hashes: Column, mBits: Int = 1 << 20,
                    numHashes: Int = 3, seed: Long = 42L): Column =
    GraftInternal.column(BloomHitCount(
      GraftInternal.expression(bits), GraftInternal.expression(hashes),
      mBits, numHashes, seed))
}
