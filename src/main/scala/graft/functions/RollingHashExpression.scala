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

object RollingHashFunctions {
  def fingerprint(text: Column): Column =
    GraftInternal.column(RollingFingerprint(GraftInternal.expression(text)))
}
