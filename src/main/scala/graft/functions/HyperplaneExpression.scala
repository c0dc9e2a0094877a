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
  * dimension d is ±1 derived from a splitmix64-style mix of
  * (seed, j, d) — deterministic everywhere, no RNG state to ship.
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

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
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
      var s = 0.0
      var d = 0
      while (d < n) {
        s += v.getFloat(d).toDouble *
          HyperplaneSignature.sign(seed, j, d)
        d += 1
      }
      if (s > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val s = ctx.freshName("s"); val z = ctx.freshName("z")
      s"""
         |int $n = $v.numElements();
         |long $sig = 0L;
         |for (int $j = 0; $j < $nBits; $j++) {
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    long $z = ${seed}L ^ ($j * 0x9E3779B97F4A7C15L) ^ (((long) $d) * 0xC2B2AE3D27D4EB4FL);
         |    $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |    $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |    $z = $z ^ ($z >>> 31);
         |    $s += (double) $v.getFloat($d) * ((($z & 1L) == 0L) ? 1.0 : -1.0);
         |  }
         |  if ($s > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignature {
  /** ±1 hyperplane component for (plane j, dim d) — splitmix64 finalizer
    * over the mixed indices; MUST stay identical to the inlined codegen
    * above. */
  def sign(seed: Long, j: Int, d: Int): Double = {
    var z = seed ^ (j * 0x9E3779B97F4A7C15L) ^ (d.toLong * 0xC2B2AE3D27D4EB4FL)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 0L) 1.0 else -1.0
  }
}

object HyperplaneFunctions {
  def hyperplaneSig(vec: Column, nBits: Int = 16, seed: Long = 42L): Column =
    GraftInternal.column(HyperplaneSignature(
      GraftInternal.expression(vec), nBits, seed))
}
