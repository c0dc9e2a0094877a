package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression for `Array[Float]` dot product.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * — is a higher-order function: HOFs are CodegenFallback, so every row
  * pays interpreted lambda dispatch per ELEMENT. This expression
  * generates a tight primitive loop inside whole-stage codegen; per-row
  * cost is ~dims fused multiply-adds, which is what a 100 TB ANN scan
  * needs. Accumulates in double (element order left-to-right, identical
  * to the interpreted path and the DuckDB oracle).
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_vector_dot needs two array<float> args, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Top-`k` nearest centroid POSITIONS for a vector, by cosine (desc,
  * ties → lower position): `vec` is `array<float>`, `cents` is the full
  * centroid table collapsed to ONE `array<array<float>>` row and
  * broadcast — so cell assignment is row-local with ZERO shuffle of the
  * corpus (the alternative — explode corpus×nCells through a
  * window-argmax — shuffles every embedding nCells times).
  *
  * Default ordering uses dot(v,c)/|c|, which ranks identically to
  * cosine (|v| is constant across cells for a row) and avoids NaN for
  * zero vectors; |c| = 0 scores -MAX. With `l2 = true` the score is
  * dot(v,c) - |c|²/2, which ranks identically to ascending L2 distance
  * (‖v-c‖² = ‖v‖² - 2(dot - ‖c‖²/2) and ‖v‖² is constant per row) —
  * the product-quantization codeword rule — while reusing the same
  * dot/norm accumulators. One tight nCells×dims codegen loop per row.
  */
case class NearestCells(left: Expression, right: Expression, k: Int,
                        l2: Boolean = false)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"nearest_cells needs (array<float>, array<array<float>>), got " +
          s"${l.simpleString} / ${r.simpleString}")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    val n = cs.numElements()
    val kk = math.min(k, n)
    val ti = new Array[Int](kk)
    val ts = new Array[Double](kk)
    var filled = 0
    var i = 0
    while (i < n) {
      val c = cs.getArray(i)
      val m = math.min(v.numElements(), c.numElements())
      var dot = 0.0; var nrm = 0.0
      var d = 0
      while (d < m) {
        val cv = c.getFloat(d).toDouble
        dot += v.getFloat(d).toDouble * cv
        nrm += cv * cv
        d += 1
      }
      val s =
        if (l2) dot - nrm / 2
        else if (nrm > 0) dot / math.sqrt(nrm)
        else -Double.MaxValue
      var pos = filled
      while (pos > 0 && s > ts(pos - 1)) pos -= 1
      if (pos < kk) {
        val last = math.min(filled, kk - 1)
        var q = last
        while (q > pos) { ts(q) = ts(q - 1); ti(q) = ti(q - 1); q -= 1 }
        ts(pos) = s; ti(pos) = i
        if (filled < kk) filled += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(ti, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs) => {
      val n = ctx.freshName("n"); val kk = ctx.freshName("kk")
      val ti = ctx.freshName("ti"); val ts = ctx.freshName("ts")
      val filled = ctx.freshName("filled"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val m = ctx.freshName("m")
      val dot = ctx.freshName("dot"); val nrm = ctx.freshName("nrm")
      val d = ctx.freshName("d"); val cv = ctx.freshName("cv")
      val s = ctx.freshName("s"); val pos = ctx.freshName("pos")
      val last = ctx.freshName("last"); val q = ctx.freshName("q")
      val arrData = classOf[ArrayData].getName
      val genArr = classOf[GenericArrayData].getName
      s"""
         |int $n = $cs.numElements();
         |int $kk = Math.min($k, $n);
         |int[] $ti = new int[$kk];
         |double[] $ts = new double[$kk];
         |int $filled = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $arrData $c = $cs.getArray($i);
         |  int $m = Math.min($v.numElements(), $c.numElements());
         |  double $dot = 0.0, $nrm = 0.0;
         |  for (int $d = 0; $d < $m; $d++) {
         |    double $cv = (double) $c.getFloat($d);
         |    $dot += (double) $v.getFloat($d) * $cv;
         |    $nrm += $cv * $cv;
         |  }
         |  double $s = ${if (l2) s"$dot - $nrm / 2"
                          else s"($nrm > 0) ? $dot / Math.sqrt($nrm) : -Double.MAX_VALUE"};
         |  int $pos = $filled;
         |  while ($pos > 0 && $s > $ts[$pos - 1]) $pos--;
         |  if ($pos < $kk) {
         |    int $last = Math.min($filled, $kk - 1);
         |    for (int $q = $last; $q > $pos; $q--) { $ts[$q] = $ts[$q - 1]; $ti[$q] = $ti[$q - 1]; }
         |    $ts[$pos] = $s; $ti[$pos] = $i;
         |    if ($filled < $kk) $filled++;
         |  }
         |}
         |${ev.value} = new $genArr(java.util.Arrays.copyOf($ti, $filled));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API over [[FloatVectorDot]]. */
  def fdot(a: Column, b: Column): Column =
    GraftInternal.column(FloatVectorDot(
      GraftInternal.expression(a), GraftInternal.expression(b)))

  /** Column API over [[NearestCells]]. */
  def nearestCells(vec: Column, cents: Column, k: Int): Column =
    GraftInternal.column(NearestCells(
      GraftInternal.expression(vec), GraftInternal.expression(cents), k))

  /** [[NearestCells]] in L2 mode — the PQ codeword-assignment rule. */
  def nearestCellsL2(vec: Column, cents: Column, k: Int): Column =
    GraftInternal.column(NearestCells(
      GraftInternal.expression(vec), GraftInternal.expression(cents), k,
      l2 = true))
}
