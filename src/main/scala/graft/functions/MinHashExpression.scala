package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over a pre-hashed shingle array: for each
  * permutation i, `min over h of ((h * a(i) + b(i)) mod p)` with
  * p = 2^31-1 (operands < 2^31 keep the product under 2^62 — no ANSI
  * overflow).
  *
  * As a native expression the whole signature is ONE tight
  * numPerms × numShingles long-arithmetic loop inside whole-stage
  * codegen. The composable formulation (64 array_min(transform(...))
  * columns) is interpreted per element — HOFs are CodegenFallback —
  * and re-walks the array per permutation with lambda dispatch.
  */
case class MinHashSignature(child: Expression, numPerms: Int, seed: Long)
    extends UnaryExpression {

  private val P = 2147483647L // 2^31 - 1

  // (a, b) per permutation from a seeded LCG — reproducible everywhere.
  @transient private lazy val (as: Array[Long], bs: Array[Long]) =
    MinHashSignature.perms(numPerms, seed)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature needs array<bigint>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[ArrayData]
    val n = h.numElements()
    val sig = new Array[Long](numPerms)
    var i = 0
    while (i < numPerms) {
      var m = Long.MaxValue
      val a = as(i); val b = bs(i)
      var j = 0
      while (j < n) {
        val v = (h.getLong(j) * a + b) % P
        if (v < m) m = v
        j += 1
      }
      sig(i) = if (n == 0) 0L else m
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    val arrCls = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, h => {
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val m = ctx.freshName("m"); val v = ctx.freshName("v")
      s"""
         |int $n = $h.numElements();
         |long[] $sig = new long[$numPerms];
         |for (int $i = 0; $i < $numPerms; $i++) {
         |  long $m = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $v = ($h.getLong($j) * $aRef[$i] + $bRef[$i]) % ${P}L;
         |    if ($v < $m) $m = $v;
         |  }
         |  $sig[$i] = ($n == 0) ? 0L : $m;
         |}
         |${ev.value} = new $arrCls($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  private val P = 2147483647L

  /** The permutation constants (a_i, b_i) from the seeded LCG — public
    * so oracle-SQL generation can embed the exact same values as
    * literals (DuckDB then reproduces every signature bit-for-bit). */
  def perms(numPerms: Int, seed: Long): (Array[Long], Array[Long]) = {
    var s = seed
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s >>> 3 }
    val a = new Array[Long](numPerms); val b = new Array[Long](numPerms)
    var i = 0
    while (i < numPerms) { a(i) = next() % (P - 1) + 1; b(i) = next() % P; i += 1 }
    (a, b)
  }
}

object MinHashFunctions {
  def minhashSig(hashes: Column, numPerms: Int = 64, seed: Long = 42L): Column =
    GraftInternal.column(MinHashSignature(
      GraftInternal.expression(hashes), numPerms, seed))
}
