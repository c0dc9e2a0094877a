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

  /** Partial buffers cross the merge exchange SPARSE when that is
    * smaller: a partition that saw k keys has ≤ k·numHashes set bits,
    * so at 16 bits/key each partial is ~3% ones — shipping the dense
    * bitmap (mBits/8 bytes per partition, 256 MiB for 32 partials of
    * a 2^26-bit sketch) is almost all zeros. Format: 1-byte tag
    * (0 = dense bitmap follows, 1 = big-endian int bit positions
    * follow); the in-memory buffer and the FINAL value stay the dense
    * bitmap, so update/merge/probe are untouched. */
  override def serialize(buf: Array[Byte]): Array[Byte] = {
    var ones = 0
    var i = 0
    while (i < buf.length) { ones += java.lang.Integer.bitCount(buf(i) & 0xFF); i += 1 }
    if (1 + 4 * ones >= 1 + buf.length) {
      val out = new Array[Byte](1 + buf.length)
      out(0) = 0
      System.arraycopy(buf, 0, out, 1, buf.length)
      out
    } else {
      val out = java.nio.ByteBuffer.allocate(1 + 4 * ones)
      out.put(1.toByte)
      var b = 0
      while (b < buf.length) {
        val v = buf(b) & 0xFF
        if (v != 0) {
          var bit = 0
          while (bit < 8) {
            if ((v & (1 << bit)) != 0) out.putInt((b << 3) | bit)
            bit += 1
          }
        }
        b += 1
      }
      out.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): Array[Byte] =
    if (bytes(0) == 0) java.util.Arrays.copyOfRange(bytes, 1, bytes.length)
    else {
      val buf = new Array[Byte](mBits / 8)
      val in = java.nio.ByteBuffer.wrap(bytes, 1, bytes.length - 1)
      while (in.hasRemaining) {
        val pos = in.getInt()
        buf(pos >> 3) = (buf(pos >> 3) | (1 << (pos & 7))).toByte
      }
      buf
    }

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

/** SELF-SIZING [[BloomSketch]]: the sketch picks its own size from the
  * key count it actually saw, removing the separate
  * `approx_count_distinct` sizing job (measured ~0.5–1 s per query at
  * sf10 — comparable to the entire bucketed join it was sizing for).
  *
  * How: bit positions are computed mod `maxBits` (a power of two) and
  * accumulated SPARSELY (append-only int array per partition — no
  * 8 MiB random-access bitmap per task, so no cache thrash), along
  * with an exact count of input rows. At eval, the final size is the
  * next power of two ≥ bitsPerKey·n (clamped to [2^16, maxBits]) and
  * every position FOLDS exactly: m* divides maxBits, and
  * `x mod 2^a mod 2^b = x mod 2^b` for b ≤ a — the folded sketch is
  * bit-identical to one built at m* directly. The membership side
  * ([[BloomHitCount]] via `autoModulus`) takes its modulus from the
  * sketch's length, so probe and build always agree.
  *
  * The row count (not distinct-key count) sizes the sketch: on a
  * build side with repeated keys it oversizes — never undersizes —
  * and the maxBits cap still bounds memory. A partition whose sparse
  * set outgrows the dense representation switches to a dense
  * maxBits bitmap (the pre-fold layout), so worst-case memory is the
  * same as the fixed-size aggregate's. */
case class BloomSketchAuto(child: Expression, maxBits: Int,
    bitsPerKey: Int, numHashes: Int, seed: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomSketchAuto.Buf]
  with UnaryLike[Expression] {
  import BloomSketchAuto.Buf

  @transient private lazy val (permA, permB) =
    MinHashSignature.perms(numHashes, seed)

  override def createAggregationBuffer(): Buf = new Buf(maxBits)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (h < 0L || h >= BloomUtil.P)
        throw new IllegalArgumentException(
          s"bloom_sketch_auto input hash $h outside [0, ${BloomUtil.P}) — " +
            "feed it a value already reduced mod the Mersenne prime")
      buf.nRows += 1L
      var j = 0
      while (j < numHashes) {
        buf.add((((permA(j) * h + permB(j)) % BloomUtil.P) % maxBits).toInt)
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = { b1.absorb(b2); b1 }

  /** Fold to the self-chosen size and emit the dense bitmap. */
  override def eval(buf: Buf): Any = {
    val want = math.max(1L, buf.nRows) * bitsPerKey
    // clamp to maxBits even below the 2^16 floor: build positions were
    // accumulated mod maxBits, so emitting a LARGER bitmap would make
    // probes use a different modulus → false negatives
    val m =
      if (want >= maxBits) maxBits
      else math.min(maxBits.toLong, math.max(1L << 16,
        java.lang.Long.highestOneBit(math.max(1L, want - 1)) << 1)).toInt
    buf.toDense(m)
  }

  override def serialize(buf: Buf): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Buf =
    Buf.fromBytes(bytes, maxBits)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_sketch_auto"

  override def checkInputDataTypes(): TypeCheckResult =
    if (maxBits < 64 || (maxBits & (maxBits - 1)) != 0)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_sketch_auto maxBits must be a power of two >= 64, got $maxBits")
    else if (numHashes < 1 || bitsPerKey < 1)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_sketch_auto needs numHashes/bitsPerKey >= 1")
    else child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_sketch_auto needs a BIGINT hash column, got ${other.simpleString}")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketchAuto =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketchAuto =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BloomSketchAuto = copy(child = newChild)
}

object BloomSketchAuto {
  /** Sparse-until-dense position accumulator. Positions are mod
    * maxBits; `dense == null` means the positions array holds the
    * first `nPos` entries. */
  final class Buf(val maxBits: Int) {
    var nRows: Long = 0L
    var nPos: Int = 0
    var positions: Array[Int] = new Array[Int](64)
    var dense: Array[Byte] = _

    def add(pos: Int): Unit =
      if (dense != null)
        dense(pos >> 3) = (dense(pos >> 3) | (1 << (pos & 7))).toByte
      else {
        if (nPos == positions.length) {
          if (positions.length * 4L * 2L >= maxBits / 8L) densify()
          else positions = java.util.Arrays.copyOf(positions, positions.length * 2)
        }
        if (dense != null)
          dense(pos >> 3) = (dense(pos >> 3) | (1 << (pos & 7))).toByte
        else { positions(nPos) = pos; nPos += 1 }
      }

    private def densify(): Unit = {
      dense = new Array[Byte](maxBits / 8)
      var i = 0
      while (i < nPos) {
        val p = positions(i)
        dense(p >> 3) = (dense(p >> 3) | (1 << (p & 7))).toByte
        i += 1
      }
      positions = null; nPos = 0
    }

    def absorb(o: Buf): Unit = {
      nRows += o.nRows
      if (o.dense != null) {
        if (dense == null) densify()
        var i = 0
        while (i < dense.length) { dense(i) = (dense(i) | o.dense(i)).toByte; i += 1 }
      } else {
        var i = 0
        while (i < o.nPos) { add(o.positions(i)); i += 1 }
      }
    }

    /** Dense bitmap at m (a power of two dividing maxBits): exact fold
      * because pos mod maxBits mod m == pos mod m. */
    def toDense(m: Int): Array[Byte] = {
      val out = new Array[Byte](m / 8)
      val mask = m - 1
      if (dense != null) {
        // fold the maxBits bitmap: OR each m-bit stripe
        var b = 0
        while (b < dense.length) {
          val v = dense(b)
          if (v != 0) out(b & ((m / 8) - 1)) = (out(b & ((m / 8) - 1)) | v).toByte
          b += 1
        }
      } else {
        var i = 0
        while (i < nPos) {
          val p = positions(i) & mask
          out(p >> 3) = (out(p >> 3) | (1 << (p & 7))).toByte
          i += 1
        }
      }
      out
    }

    def toBytes: Array[Byte] = {
      if (dense != null) {
        val bb = java.nio.ByteBuffer.allocate(9 + dense.length)
        bb.put(0.toByte).putLong(nRows).put(dense)
        bb.array()
      } else {
        val bb = java.nio.ByteBuffer.allocate(9 + 4 * nPos)
        bb.put(1.toByte).putLong(nRows)
        var i = 0
        while (i < nPos) { bb.putInt(positions(i)); i += 1 }
        bb.array()
      }
    }
  }

  object Buf {
    def fromBytes(bytes: Array[Byte], maxBits: Int): Buf = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val tag = bb.get()
      val buf = new Buf(maxBits)
      buf.nRows = bb.getLong()
      if (tag == 0) {
        buf.dense = new Array[Byte](maxBits / 8)
        bb.get(buf.dense)
        buf.positions = null
      } else {
        val n = bb.remaining() / 4
        buf.positions = new Array[Int](math.max(64, n))
        var i = 0
        while (i < n) { buf.positions(i) = bb.getInt(); i += 1 }
        buf.nPos = n
      }
      buf
    }
  }
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

/** Membership side of [[BloomSketchAuto]]: identical probe loop, but
  * the modulus comes from the sketch's OWN length (bits.length·8) —
  * the sketch chose its size at build time, so the probe cannot be
  * parameterized with a compile-time constant. The length is
  * validated to be a power of two ≥ 64 (anything else means the
  * binary isn't a self-sized sketch). */
case class BloomHitCountAuto(left: Expression, right: Expression,
    numHashes: Int, seed: Long)
  extends BinaryExpression with BinaryLike[Expression] {

  @transient private lazy val (permA, permB) =
    MinHashSignature.perms(numHashes, seed)

  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_hit_count_auto"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_hit_count_auto needs (binary, array<bigint>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(bits: Any, hashes: Any): Any = {
    val b = bits.asInstanceOf[Array[Byte]]
    BloomUtil.hitCount(b, hashes.asInstanceOf[ArrayData], permA, permB,
      BloomUtil.autoModulus(b))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bloomA", permA, "long[]")
    val bRef = ctx.addReferenceObj("bloomB", permB, "long[]")
    nullSafeCodeGen(ctx, ev, (bits, hs) =>
      s"${ev.value} = graft.functions.BloomUtil.hitCount($bits, $hs, " +
        s"$aRef, $bRef, graft.functions.BloomUtil.autoModulus($bits));")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomUtil {
  final val P = 2147483647L // 2^31 - 1

  /** Modulus of a self-sized sketch = its own bit length; fails loudly
    * on a binary that cannot be one. */
  def autoModulus(bits: Array[Byte]): Int = {
    val m = bits.length * 8
    if (m < 64 || (m & (m - 1)) != 0)
      throw new IllegalArgumentException(
        s"bloom_hit_count_auto: $m-bit array is not a self-sized sketch " +
          "(length must be a power of two >= 64)")
    m
  }

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

  /** [[BloomSketchAuto]] as a Column aggregate. */
  def bloomAggAuto(hash: Column, maxBits: Int = 1 << 27,
                   bitsPerKey: Int = 16, numHashes: Int = 3,
                   seed: Long = 42L): Column =
    GraftInternal.column(
      BloomSketchAuto(GraftInternal.expression(hash), maxBits, bitsPerKey,
        numHashes, seed).toAggregateExpression())

  /** [[BloomHitCountAuto]] as a Column. */
  def bloomHitCountAuto(bits: Column, hashes: Column, numHashes: Int = 3,
                        seed: Long = 42L): Column =
    GraftInternal.column(BloomHitCountAuto(
      GraftInternal.expression(bits), GraftInternal.expression(hashes),
      numHashes, seed))
}
