package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term frequencies in ONE row-local pass: token array →
  * `map<term, count>` (empty tokens skipped, keys sorted bytewise).
  *
  * This is t08's tf stage collapsed into an expression. The relational
  * formulation — `explode(tokens)` then `GROUP BY doc_id, term` — pays
  * a full exchange of every (doc_id, term) pair just to count
  * duplicates that all live in the SAME row's token array; at corpus
  * scale that is the largest shuffle in the TF-IDF pipeline and it
  * moves strictly row-local information. Here tf never shuffles at
  * all: `explode(term_counts(tokens))` yields the exact
  * (doc_id, term, tf) rows of the grouped version, still partitioned
  * however the corpus scan was, so the only downstream exchange left
  * in t08 is the per-doc ranking window (whose WindowGroupLimit
  * partial pre-trims to k rows per doc before shuffling).
  *
  * Document frequency reuses the same expression: `map_keys` of this
  * map is the per-doc distinct term set, so `explode(map_keys(...))`
  * + count is df with map-side combine — no distinct-pairs exchange.
  *
  * Keys are cloned out of the (possibly buffer-backed) input array and
  * sorted bytewise, so the produced map owns its memory and iterates
  * deterministically. Counting uses a TreeMap: documents have
  * vocabulary-bounded distinct-term counts (tens to thousands), far
  * below where an open-addressing table would win, and the sorted
  * order falls out for free.
  */
case class TermCountMap(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "term_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"term_counts needs array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TermCountUtil.termCounts(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TermCountUtil.termCounts($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TermCountUtil {

  /** Static (codegen-callable) core. Null and empty tokens are skipped
    * (the relational form filters `term <> ''`; a null token has no
    * term). */
  def termCounts(tokens: ArrayData): MapData = {
    val m = tokens.numElements()
    val counts = new java.util.TreeMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < m) {
      if (!tokens.isNullAt(i)) {
        val us = tokens.getUTF8String(i)
        if (us != null && us.numBytes() > 0) {
          val slot = counts.get(us)
          if (slot == null) counts.put(us.clone(), Array(1L))
          else slot(0) += 1L
        }
      }
      i += 1
    }
    val n = counts.size()
    val keys = new Array[AnyRef](n)
    val vals = new Array[Long](n)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue()(0)
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}

object TermCountFunctions {
  def termCounts(tokens: Column): Column =
    GraftInternal.column(TermCountMap(GraftInternal.expression(tokens)))
}
