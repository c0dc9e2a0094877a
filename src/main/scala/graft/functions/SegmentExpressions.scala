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

  /** Visit each CONTENT-DEFINED segment's byte span (d17): a token
    * closes its segment iff its [[RollingFingerprintUtil]] fingerprint
    * is ≡ 0 mod `modB` (the last token always closes). The fingerprint
    * is computed over the token's code points by decoding UTF-8 in
    * place — same value as `rolling_fingerprint` over the token
    * string. */
  private def visitCdc(u: UTF8String, modB: Int)(
      f: (Int, Int) => Unit): Unit = {
    val n = u.numBytes()
    val base = u.getBaseObject
    val off = u.getBaseOffset
    val P = 2147483647L
    var i = 0
    var segStart = 0
    var tokStart = 0
    var h1 = 0L
    var h2 = 0L
    while (i <= n) {
      val atEnd = i == n
      val b0 = if (atEnd) 0x20 else Platform.getByte(base, off + i) & 0xFF
      if (b0 == 0x20) {
        // token [tokStart, i) ends; its fingerprint is (h1 << 31) | h2
        val fp = (h1 << 31) | h2
        if (fp % modB == 0 || atEnd) { f(segStart, i); segStart = i + 1 }
        tokStart = i + 1; h1 = 0L; h2 = 0L
        i += 1
      } else {
        // decode one UTF-8 code point
        var cp = 0
        var len = 1
        if (b0 < 0x80) cp = b0
        else if ((b0 & 0xE0) == 0xC0) {
          cp = ((b0 & 0x1F) << 6) |
            (Platform.getByte(base, off + i + 1) & 0x3F); len = 2
        } else if ((b0 & 0xF0) == 0xE0) {
          cp = ((b0 & 0x0F) << 12) |
            ((Platform.getByte(base, off + i + 1) & 0x3F) << 6) |
            (Platform.getByte(base, off + i + 2) & 0x3F); len = 3
        } else {
          cp = ((b0 & 0x07) << 18) |
            ((Platform.getByte(base, off + i + 1) & 0x3F) << 12) |
            ((Platform.getByte(base, off + i + 2) & 0x3F) << 6) |
            (Platform.getByte(base, off + i + 3) & 0x3F); len = 4
        }
        h1 = (h1 * 131L + cp) % P
        h2 = (h2 * 257L + cp) % P
        i += len
      }
    }
  }

  def cdcSegmentHashes(u: UTF8String, modB: Int): ArrayData = {
    var out = new Array[Long](8)
    var k = 0
    visitCdc(u, modB) { (s, e) =>
      if (k == out.length) out = java.util.Arrays.copyOf(out, k * 2)
      out(k) = XXH64.hashUnsafeBytes(u.getBaseObject,
        u.getBaseOffset + s, e - s, Seed)
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  def cdcCleanse(u: UTF8String, modB: Int, hot: LongSetRef): InternalRow =
    cleanseSpans(u, hot, f => visitCdc(u, modB)(f))

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

  def cleanse(u: UTF8String, segTokens: Int, hot: LongSetRef): InternalRow =
    cleanseSpans(u, hot, f => visitSegments(u, segTokens)(f))

  private def cleanseSpans(u: UTF8String, hot: LongSetRef,
      visit: ((Int, Int) => Unit) => Unit): InternalRow = {
    var spans = new Array[Int](16) // (start, end) pairs of survivors
    var k = 0
    var keptBytes = 0
    var nSeg = 0L
    var nDropped = 0L
    visit { (s, e) =>
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

/** `cdc_segment_hashes(text)` — xxhash64 of each content-defined
  * segment (d17's boundaries), in order. */
case class CdcSegmentHashes(child: Expression, modB: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_segment_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if modB > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"cdc_segment_hashes needs modB > 0, got $modB")
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_segment_hashes needs string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SegmentUtil.cdcSegmentHashes(input.asInstanceOf[UTF8String], modB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SegmentUtil.cdcSegmentHashes($c, $modB);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `cdc_segment_cleanse(text)` — d17's rebuild half, one byte walk. */
case class CdcSegmentCleanse(child: Expression, modB: Int,
    hot: Array[Long]) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_seg", LongType, nullable = false),
    StructField("n_dropped", LongType, nullable = false),
    StructField("cleaned_text", StringType, nullable = false)))
  override def prettyName: String = "cdc_segment_cleanse"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if modB > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"cdc_segment_cleanse needs modB > 0, got $modB")
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_segment_cleanse needs string, got ${other.simpleString}")
  }

  private lazy val ref = new LongSetRef(hot)

  override protected def nullSafeEval(input: Any): Any =
    SegmentUtil.cdcCleanse(input.asInstanceOf[UTF8String], modB, ref)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("hotSet", ref, classOf[LongSetRef].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SegmentUtil.cdcCleanse($c, $modB, $r);")
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

  def cdcSegmentHashes(text: Column, modB: Int): Column =
    GraftInternal.column(
      CdcSegmentHashes(GraftInternal.expression(text), modB))

  def cdcSegmentCleanse(text: Column, modB: Int, hot: Array[Long]): Column =
    GraftInternal.column(
      CdcSegmentCleanse(GraftInternal.expression(text), modB, hot))
}
