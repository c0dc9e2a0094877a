package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused n-token shingle fingerprints: token array → sorted-distinct
  * array of `rolling_fingerprint(tok_i ++ ' ' ++ … ++ tok_{i+n-1})`
  * (optionally mod 2^31-1), WITHOUT materializing a single shingle
  * string.
  *
  * The composable formulation — zip_with chains building progressively
  * longer concat strings, then a fingerprint per shingle, then
  * array_distinct — allocates ~n strings per window inside interpreted
  * higher-order functions. Here each token's rolling hash and length
  * power are computed once (O(total chars)), and every window hash is
  * O(n) modular composition: h(X ++ Y) = h(X)·B^|Y| + h(Y) (mod p).
  * Values are identical to the composed formulation, so the generated
  * DuckDB oracles keep matching bit-for-bit. Output order is sorted
  * (all consumers — MinHash, SimHash votes, set intersection — are
  * order-insensitive, and the oracles dedup by value too).
  */
case class HashedShingles(child: Expression, n: Int, modP: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles needs array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.hashedShingles(input.asInstanceOf[ArrayData], n, modP)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleUtil.hashedShingles($c, $n, $modP);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleUtil {
  private final val P = 2147483647L // 2^31 - 1

  /** Static (codegen-callable) core. One pass over all token chars,
    * then O(n) per window; sort + in-place dedup at the end. */
  def hashedShingles(tokens: ArrayData, n: Int, modP: Boolean): ArrayData = {
    val m = tokens.numElements()
    val wins = m - n + 1
    if (wins <= 0) return new GenericArrayData(Array.emptyLongArray)
    val h1 = new Array[Long](m); val h2 = new Array[Long](m)
    val p1 = new Array[Long](m); val p2 = new Array[Long](m)
    var i = 0
    while (i < m) {
      // null tokens hash like the empty string (the declared input type
      // allows containsNull=true, and getUTF8String would NPE) — the
      // window still contributes the separator, mirroring what the
      // composed concat_ws-style formulation yields for empty tokens
      val us = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      val s = if (us == null) "" else us.toString
      var a = 0L; var b = 0L; var q1 = 1L; var q2 = 1L
      var j = 0
      while (j < s.length) {
        val cp = s.codePointAt(j)
        a = (a * 131 + cp) % P; b = (b * 257 + cp) % P
        q1 = (q1 * 131) % P; q2 = (q2 * 257) % P
        j += Character.charCount(cp)
      }
      h1(i) = a; h2(i) = b; p1(i) = q1; p2(i) = q2
      i += 1
    }
    val out = new Array[Long](wins)
    var w = 0
    while (w < wins) {
      var a = h1(w); var b = h2(w)
      var k = 1
      while (k < n) {
        a = ((a * 131 + 32) % P * p1(w + k) + h1(w + k)) % P
        b = ((b * 257 + 32) % P * p2(w + k) + h2(w + k)) % P
        k += 1
      }
      val packed = (a << 31) | b
      out(w) = if (modP) packed % P else packed
      w += 1
    }
    java.util.Arrays.sort(out)
    var u = 0; var x = 0
    while (x < wins) {
      if (u == 0 || out(x) != out(u - 1)) { out(u) = out(x); u += 1 }
      x += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, u))
  }
}

object ShingleFunctions {
  def hashedShingles(tokens: Column, n: Int = 3, modP: Boolean = true): Column =
    GraftInternal.column(HashedShingles(
      GraftInternal.expression(tokens), n, modP))
}
