package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash over pre-computed feature hashes: per bit, sum ±1
  * votes across all hashes; the sign becomes the fingerprint bit. One
  * codegen'd n×64 loop — the composable form (64 aggregate() columns)
  * is interpreted and re-walks the array per bit.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<bigint>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[ArrayData]
    val n = h.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val v = h.getLong(j)
      var b = 0
      while (b < 64) { votes(b) += (((v >>> b) & 1L).toInt * 2) - 1; b += 1 }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val n = ctx.freshName("n"); val votes = ctx.freshName("votes")
      val j = ctx.freshName("j"); val b = ctx.freshName("b")
      val v = ctx.freshName("v"); val fp = ctx.freshName("fp")
      s"""
         |int $n = $h.numElements();
         |int[] $votes = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $v = $h.getLong($j);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $votes[$b] += (int) ((($v >>> $b) & 1L) * 2L) - 1;
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $fp |= (1L << $b);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashFunctions {
  def simhash64(hashes: Column): Column =
    GraftInternal.column(SimHash64(GraftInternal.expression(hashes)))
}
