package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 62-bit polynomial rolling-hash fingerprint of a string: two
  * independent 31-bit rolling hashes over the UNICODE CODE POINTS,
  * h_B = fold(h·B + cp mod (2^31-1), 0), packed as (h_131 << 31) | h_257.
  *
  * Code points (not bytes, not UTF-16 chars) are the cross-engine
  * contract: DuckDB's `string_split(s, '')` + `unicode(ch)` enumerates
  * exactly the same sequence, so the fingerprint is oracle-checkable.
  * Modular form keeps every intermediate < 2^40 — no overflow anywhere.
  *
  * One static call per row inside whole-stage codegen; the composable
  * `aggregate(transform(split(s, ''), ascii))` formulation is an
  * interpreted higher-order function (CodegenFallback) AND `ascii`
  * truncates non-ASCII code points.
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint needs string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RollingFingerprintUtil.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.RollingFingerprintUtil.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprintUtil {
  private final val P = 2147483647L // 2^31 - 1

  /** Static (codegen-callable) fingerprint core. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var h1 = 0L
    var h2 = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h1 = (h1 * 131L + cp) % P
      h2 = (h2 * 257L + cp) % P
      i += Character.charCount(cp)
    }
    (h1 << 31) | h2
  }
}

/** Content-defined segmentation of a token array (the rsync/LBFS
  * chunking idea lifted to tokens, d17): token i CLOSES its segment
  * iff `rolling_fingerprint(token) % modB == 0` (the final token
  * always closes), giving expected segment length modB. Because
  * boundaries depend only on CONTENT, an insertion or deletion
  * re-keys at most the segment it lands in — the boundaries
  * downstream resynchronize. d16's aligned windows cannot do this:
  * one token prepended shifts every later window and re-keys the
  * whole document. One codegen'd pass per row; segments come back
  * space-joined. */
case class CdcSegments(child: Expression, modB: Int) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_segments"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_segments needs array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CdcSegmentUtil.segments(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], modB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcSegmentUtil.segments($c, $modB);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcSegmentUtil {
  private val SPACE = UTF8String.fromString(" ")

  /** Static (codegen-callable) core of [[CdcSegments]]. */
  def segments(tokens: org.apache.spark.sql.catalyst.util.ArrayData,
               modB: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = tokens.numElements()
    val out = new java.util.ArrayList[AnyRef]()
    var segStart = 0
    var i = 0
    while (i < n) {
      val tok = tokens.getUTF8String(i)
      val fp = if (tok == null) 0L else RollingFingerprintUtil.compute(tok)
      if (fp % modB == 0 || i == n - 1) {
        val parts = new Array[UTF8String](i - segStart + 1)
        var j = segStart
        while (j <= i) { parts(j - segStart) = tokens.getUTF8String(j); j += 1 }
        out.add(UTF8String.concatWs(SPACE, parts: _*))
        segStart = i + 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

object RollingHashFunctions {
  def fingerprint(text: Column): Column =
    GraftInternal.column(RollingFingerprint(GraftInternal.expression(text)))
  def cdcSegments(tokens: Column, modB: Int): Column =
    GraftInternal.column(CdcSegments(GraftInternal.expression(tokens), modB))
}
