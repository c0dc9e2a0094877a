package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Bpe

/** Row-local trained-BPE application (t14): document text → the
  * concatenated BPE token stream of its `[a-z]+` words, against a
  * merges table fixed at plan time.
  *
  * The merges table rides as a reference object on the codegen'd
  * expression — the same zero-shuffle distribution path as the d09
  * Bloom literal: every task encodes its rows locally, the corpus
  * never moves. Word encodings memoize in a per-codec concurrent map
  * (natural-language word frequency is Zipfian, so the cache hit rate
  * approaches 1; capped so adversarial all-unique corpora degrade to
  * recompute, never to memory growth).
  *
  * Merge semantics are [[graft.operators.Bpe]]'s fixed-point loop —
  * identical to the trainer and to the recursive-CTE DuckDB oracle,
  * which is what makes t14 bit-exactly checkable cross-engine.
  */
final class BpeCodec(flat: Array[String]) extends Serializable {

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](flat.length * 2)
    var i = 0
    while (i < flat.length) { m.put(flat(i), Integer.valueOf(i)); i += 1 }
    m
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val CacheCap = 1 << 16

  @transient private lazy val wordRe =
    java.util.regex.Pattern.compile(Bpe.WordPattern)

  private def encode(w: String): Array[String] = {
    val hit = cache.get(w)
    if (hit != null) hit
    else {
      val toks = Bpe.encodeWord(w, ranks)
      if (cache.size < CacheCap) cache.put(w, toks)
      toks
    }
  }

  def encodeText(text: UTF8String): ArrayData = {
    val s = text.toLowerCase.toString
    val m = wordRe.matcher(s)
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](s.length / 4)
    while (m.find()) {
      val toks = encode(m.group())
      var i = 0
      while (i < toks.length) {
        out += UTF8String.fromString(toks(i)); i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** `bpe_encode(text)` — array of BPE tokens of the document's words,
  * in document order, against the codec's fixed merges table. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode needs string, got ${other.simpleString}")
  }

  private lazy val codec = new BpeCodec(merges.map { case (l, r) => s"$l $r" }.toArray)

  override protected def nullSafeEval(input: Any): Any =
    codec.encodeText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCodec", codec,
      classOf[BpeCodec].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encodeText($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeFunctions {
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    GraftInternal.column(BpeEncode(GraftInternal.expression(text), merges))
}
