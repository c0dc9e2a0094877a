package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** nBits-bit random-hyperplane LSH signature of an `Array[Float]`
  * vector: bit j = sign(dot(plane_j, v)), where plane_j's component for
  * dimension d is ±1 — the parity of ((a_j·(d+1) + b_j) mod p)² mod p
  * with p = 2^31-1 and (a_j, b_j) from the shared seeded LCG
  * ([[MinHashSignature.perms]]). Deterministic everywhere, no RNG
  * state to ship, and — unlike a 64-bit avalanche mix — expressible in
  * DuckDB's wraparound-free BIGINT arithmetic, so the whole LSH
  * pipeline is oracle-checkable. (The quadratic scramble matters: the
  * parity of a bare linear congruence along d is constant between
  * mod-wraps; squaring varies the increment so parities mix. Recall
  * specs hold at the same thresholds as the avalanche version.)
  *
  * As a native expression the whole signature is ONE tight
  * nBits × dims fused multiply-add loop inside whole-stage codegen. The
  * composable formulation (nBits `aggregate(zip_with(...))` columns) is
  * interpreted per element — higher-order functions are CodegenFallback
  * — which made the signature the dominant cost of the LSH ANN and
  * embedding near-dup paths.
  */
case class HyperplaneSignature(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression {

  @transient private lazy val (as: Array[Long], bs: Array[Long]) =
    MinHashSignature.perms(nBits, seed)

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_signature"

  // enforced here (not only in the SQL registration) so the Scala API
  // fails at analysis too: nBits > 63 would silently wrap `1L << j`
  // (bit 64 aliases bit 0) into a corrupt signature
  override def checkInputDataTypes(): TypeCheckResult =
    if (nBits < 1 || nBits > 63)
      TypeCheckResult.TypeCheckFailure(
        s"hyperplane_signature nBits must be in 1..63, got $nBits")
    else child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_signature needs array<float>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var sig = 0L
    var j = 0
    while (j < nBits) {
      val a = as(j); val b = bs(j)
      var s = 0.0
      var d = 0
      while (d < n) {
        s += v.getFloat(d).toDouble * HyperplaneSignature.sign(a, b, d)
        d += 1
      }
      if (s > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("hyperA", as, "long[]")
    val bRef = ctx.addReferenceObj("hyperB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val s = ctx.freshName("s"); val u = ctx.freshName("u")
      s"""
         |int $n = $v.numElements();
         |long $sig = 0L;
         |for (int $j = 0; $j < $nBits; $j++) {
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    long $u = ($aRef[$j] * ($d + 1L) + $bRef[$j]) % ${HyperplaneSignature.P}L;
         |    $u = ($u * $u) % ${HyperplaneSignature.P}L;
         |    $s += (double) $v.getFloat($d) * ((($u & 1L) == 0L) ? 1.0 : -1.0);
         |  }
         |  if ($s > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignature {
  val P = 2147483647L // 2^31 - 1; keeps a·(d+1)+b < 2^62 and u² < 2^62

  /** ±1 hyperplane component for (plane (a,b), dim d) — parity of the
    * quadratically-scrambled congruence; MUST stay identical to the
    * inlined codegen above and to the oracle-SQL generation. */
  def sign(a: Long, b: Long, d: Int): Double = {
    var u = (a * (d + 1L) + b) % P
    u = (u * u) % P
    if ((u & 1L) == 0L) 1.0 else -1.0
  }
}

object HyperplaneFunctions {
  def hyperplaneSig(vec: Column, nBits: Int = 16, seed: Long = 42L): Column =
    GraftInternal.column(HyperplaneSignature(
      GraftInternal.expression(vec), nBits, seed))
}
