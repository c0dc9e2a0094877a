package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The 52-bit md5-prefix integer every portable sampler/digest here
  * uses (`CAST(conv(substring(md5(s), 1, 13), 16, 10) AS BIGINT)`),
  * computed directly from the digest bytes: first 13 hex nibbles of
  * md5 = the high 52 bits of the first 7 digest bytes.
  *
  * Bit-identical to the composable spelling (and to DuckDB's
  * `('0x' || substr(md5(s), 1, 13))::BIGINT`, the oracle's side), but
  * one static call per row: a THREAD-LOCAL MessageDigest replaces the
  * per-row `MessageDigest.getInstance` inside Spark's `md5`, and the
  * 32-char hex string, its substring copy, and `conv`'s digit parse
  * never exist. q72's range digest hashes every row of both replicas
  * — at 100 TB this is the dominant map-side cost of the anti-entropy
  * scan, and it is pure per-row CPU, so the constant matters.
  */
case class Md5Prefix52(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix52"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix52 needs string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix52Util.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Md5Prefix52Util.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix52Util {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static (codegen-callable) digest core: md5 of the UTF-8 bytes,
    * high 52 bits of the first 7 digest bytes (hex chars 1..13). */
  def compute(s: UTF8String): Long = {
    val md = tl.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
