package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass byte-level kernels for d16's aligned-segment dedup.
  *
  * The spelled-out plan — `split(text, " ")` → `transform(sequence(…),
  * slice+array_join)` → `filter(…, xxhash probe)` → `array_join` —
  * builds THREE intermediate arrays of freshly-allocated segment
  * strings per document, and every higher-order function in it is
  * CodegenFallback (interpreted per element). These expressions do the
  * same work in one walk over the document's UTF-8 bytes: a segment is
  * a byte SPAN (tokens joined by single spaces are exactly a substring
  * of the original text, because the tokens came from splitting on
  * single spaces), so hashing reads the span in place and rebuilding
  * copies surviving spans once into the output buffer. Measured at
  * sf10 (d16): 7.4 s → see BENCH_sf10.
  *
  * Tokenization parity: `split(text, " ")` with Java split(-1)
  * semantics — "" is one empty token, consecutive spaces make empty
  * tokens, a trailing space makes a trailing empty token. The hash is
  * Spark's `xxhash64` (XXH64 over the span's bytes, seed 42), so
  * fingerprints interoperate with `xxhash64(seg)` built elsewhere. */
object SegmentUtil {
  final val Seed = 42L

  /** Visit each aligned `segTokens`-token segment's byte span
    * [start, end) of `u`; returns the segment count. */
  private def visitSegments(u: UTF8String, segTokens: Int)(
      f: (Int, Int) => Unit): Int = {
    val n = u.numBytes()
    val base = u.getBaseObject
    val off = u.getBaseOffset
    var i = 0
    var tokenIdx = 0
    var segStart = 0
    var nSeg = 0
    while (i <= n) {
      val atEnd = i == n
      if (atEnd || Platform.getByte(base, off + i) == 0x20) {
        // token `tokenIdx` ends at byte i
        if (tokenIdx % segTokens == segTokens - 1 || atEnd) {
          f(segStart, i)
          nSeg += 1
          segStart = i + 1
        }
        tokenIdx += 1
      }
      i += 1
    }
    nSeg
  }

  def segmentHashes(u: UTF8String, segTokens: Int): ArrayData = {
    var out = new Array[Long](8)
    var k = 0
    visitSegments(u, segTokens) { (s, e) =>
      if (k == out.length) out = java.util.Arrays.copyOf(out, k * 2)
      out(k) = XXH64.hashUnsafeBytes(u.getBaseObject,
        u.getBaseOffset + s, e - s, Seed)
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  def cleanse(u: UTF8String, segTokens: Int, hot: LongSetRef): InternalRow = {
    var spans = new Array[Int](16) // (start, end) pairs of survivors
    var k = 0
    var keptBytes = 0
    var nSeg = 0L
    var nDropped = 0L
    visitSegments(u, segTokens) { (s, e) =>
      nSeg += 1
      val h = XXH64.hashUnsafeBytes(u.getBaseObject,
        u.getBaseOffset + s, e - s, Seed)
      if (hot.contains(h)) nDropped += 1
      else {
        if (k == spans.length) spans = java.util.Arrays.copyOf(spans, k * 2)
        spans(k) = s; spans(k + 1) = e; k += 2
        keptBytes += e - s
      }
    }
    val nKept = k / 2
    val out = new Array[Byte](keptBytes + math.max(0, nKept - 1))
    var pos = 0
    var j = 0
    while (j < k) {
      if (j > 0) { out(pos) = 0x20; pos += 1 }
      val len = spans(j + 1) - spans(j)
      Platform.copyMemory(u.getBaseObject, u.getBaseOffset + spans(j),
        out, Platform.BYTE_ARRAY_OFFSET + pos, len)
      pos += len
      j += 2
    }
    new GenericInternalRow(Array[Any](nSeg, nDropped,
      UTF8String.fromBytes(out)))
  }
}

/** `segment_hashes(text)` — xxhash64 of each aligned segment, in
  * order. The corpus-count side of d16's pass 1. */
case class SegmentHashes(child: Expression, segTokens: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "segment_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if segTokens > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"segment_hashes needs segTokens > 0, got $segTokens")
    case other => TypeCheckResult.TypeCheckFailure(
      s"segment_hashes needs string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SegmentUtil.segmentHashes(input.asInstanceOf[UTF8String], segTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SegmentUtil.segmentHashes($c, $segTokens);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `segment_cleanse(text)` — (n_seg, n_dropped, cleaned_text) against
  * the hot fingerprint set carried as a hashed plan reference
  * ([[LongSetRef]], d16's O(1) probe). The rebuild side of d16's
  * pass 2, one byte walk per document. */
case class SegmentCleanse(child: Expression, segTokens: Int,
    hot: Array[Long]) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_seg", LongType, nullable = false),
    StructField("n_dropped", LongType, nullable = false),
    StructField("cleaned_text", StringType, nullable = false)))
  override def prettyName: String = "segment_cleanse"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if segTokens > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"segment_cleanse needs segTokens > 0, got $segTokens")
    case other => TypeCheckResult.TypeCheckFailure(
      s"segment_cleanse needs string, got ${other.simpleString}")
  }

  private lazy val ref = new LongSetRef(hot)

  override protected def nullSafeEval(input: Any): Any =
    SegmentUtil.cleanse(input.asInstanceOf[UTF8String], segTokens, ref)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("hotSet", ref, classOf[LongSetRef].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SegmentUtil.cleanse($c, $segTokens, $r);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SegmentFunctions {
  def segmentHashes(text: Column, segTokens: Int): Column =
    GraftInternal.column(
      SegmentHashes(GraftInternal.expression(text), segTokens))

  def segmentCleanse(text: Column, segTokens: Int, hot: Array[Long]): Column =
    GraftInternal.column(
      SegmentCleanse(GraftInternal.expression(text), segTokens, hot))
}
