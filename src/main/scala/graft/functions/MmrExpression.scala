package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Greedy maximal-marginal-relevance selection over ONE query's
  * candidate array (s07): pick k of
  * `struct(vec_id long, rel double, embedding array<float>)`
  * maximizing `λ·rel − (1−λ)·max_{s∈selected} cos(c, s)`, ties by
  * vec_id ascending. Returns `array<struct<rank int, vec_id long,
  * score double>>` in selection order.
  *
  * The greedy recurrence is inherently sequential in k, so as
  * DataFrame ops it costs either k chained window stages (k
  * driver-roundtrip jobs when materialized, 2^k lineage when not —
  * both measured, see Similarity.mmrTopK) — or ONE expression over
  * the collected candidate array. This is the expression: per query
  * the candidate set is bounded (≤ cand rows), so the O(k·cand)
  * cosine loop is row-local work on a handful of grouped rows.
  * CodegenFallback is deliberate — it runs once per QUERY, not per
  * corpus row; nothing here is a hot path.
  *
  * All arithmetic replicates the engine-exact conventions the
  * similarity family already oracles: the dot product is
  * [[FloatVectorDot]]'s sequential left-to-right double fold, λ and
  * 1−λ are plain IEEE doubles — so the selected SET matches a SQL
  * replay bit-for-bit. */
case class MmrSelect(child: Expression, k: Int, lam: Double)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "mmr_select"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("vec_id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, DoubleType, _, _),
        StructField(_, ArrayType(FloatType, _), _, _))), _) =>
      if (k >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"mmr_select k must be >= 1, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      "mmr_select needs array<struct<bigint, double, array<float>>>, got "
        + other.simpleString)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val rel = new Array[Double](n)
    val emb = new Array[Array[Float]](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      ids(i) = row.getLong(0)
      rel(i) = row.getDouble(1)
      emb(i) = row.getArray(2).toFloatArray()
      i += 1
    }
    val pen = new Array[Double](n)
    val taken = new Array[Boolean](n)
    val out = new Array[Any](math.min(k, n))
    var r = 0
    while (r < out.length) {
      var best = -1
      var bestScore = 0.0
      var j = 0
      while (j < n) {
        if (!taken(j)) {
          val s = lam * rel(j) - (1.0 - lam) * pen(j)
          if (best < 0 || s > bestScore ||
              (s == bestScore && ids(j) < ids(best))) {
            best = j; bestScore = s
          }
        }
        j += 1
      }
      taken(best) = true
      out(r) = InternalRow(r + 1, ids(best), bestScore)
      var j2 = 0
      while (j2 < n) {
        if (!taken(j2)) {
          val c = MmrSelect.cosine(emb(j2), emb(best))
          if (c > pen(j2)) pen(j2) = c
        }
        j2 += 1
      }
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MmrSelect =
    copy(child = newChild)
}

object MmrSelect {
  /** [[FloatVectorDot]]'s exact fold, applied to cosine — sequential
    * left-to-right double accumulation, the cross-engine convention. */
  private[functions] def cosine(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
}

object MmrFunctions {
  def mmrSelect(cands: Column, k: Int, lam: Double = 0.7): Column =
    GraftInternal.column(MmrSelect(GraftInternal.expression(cands), k, lam))
}
