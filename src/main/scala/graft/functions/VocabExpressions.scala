package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Corpus-trained vocabulary scoring, applied row-locally.
  *
  * Both expressions here follow the [[InStringSet]] distribution
  * contract (the d16 lesson, SURVEY §6): the trained model — a token
  * top-list or an n-gram count table, the output of a previous
  * map-side-combined aggregation job — rides the plan as a hashed
  * REFERENCE OBJECT, so the per-row probe is O(1), the generated code
  * is one static call, and the task binary carries the model once in
  * serialized form instead of splicing it into codegen. The corpus
  * itself is scanned once and never shuffled: this is the
  * quality-filter shape of CCNet/Gopher-style pipelines, where the
  * model is vocabulary-sized (KBs–MBs) and the data is the 100 TB
  * side.
  */
final class StringLongMapRef(entries: Array[(String, Long)]) extends Serializable {
  @transient private lazy val map: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](entries.length * 2)
    entries.foreach { case (k, v) => m.put(UTF8String.fromString(k), java.lang.Long.valueOf(v)) }
    m
  }
  def getOrElse(k: UTF8String, dflt: Long): Long = {
    val v = map.get(k)
    if (v == null) dflt else v.longValue()
  }
}

/** `vocab_stats(tokens)` → struct(n_tok, n_oov): non-empty token count
  * and how many of those are OUTSIDE the top-K vocabulary — the
  * Gopher-style "fraction of words in the top word list" quality
  * signal, in one row-local pass. Empty/null tokens are skipped (the
  * `split` of an empty string is `[""]`, which must count as zero
  * tokens — same convention as [[TermCountMap]]).
  */
case class VocabStats(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_oov", LongType, nullable = false)))
  override def prettyName: String = "vocab_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vocab_stats needs array<string>, got ${other.simpleString}")
  }

  private lazy val ref = new StringSetRef(vocab.toArray)

  override protected def nullSafeEval(input: Any): Any =
    VocabUtil.vocabStats(input.asInstanceOf[ArrayData], ref)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("vocabSet", ref, classOf[StringSetRef].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VocabUtil.vocabStats($c, $r);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bigram_surprise(tokens)` → struct(n_bigrams, total_bits): a
  * perplexity-bucket signal from a corpus-trained bigram model, fully
  * integer-exact so it oracles bit-identically across engines.
  *
  * Per adjacent token pair (w1, w2) the "surprise" is
  * `floor(log2(c_uni(w1) div c_big(w1 w2)))` bits — the integer
  * exponent of the inverse conditional frequency p(w2|w1). A pair
  * missing from the (top-K-pruned) bigram table falls back to count 1,
  * i.e. maximum surprise for its prefix: pruning penalizes rare
  * continuations, which is the desired filter behavior. floor(log2) is
  * computed on INTEGERS (`63 - numberOfLeadingZeros` here,
  * `length(bin(x)) - 1` in the oracle) — a double `log2` is off by an
  * ulp around exact powers of two in some libm's and floors the wrong
  * way, so it never enters the computation.
  */
case class BigramSurprise(child: Expression,
                          uni: Seq[(String, Long)],
                          big: Seq[(String, Long)])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("total_bits", LongType, nullable = false)))
  override def prettyName: String = "bigram_surprise"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bigram_surprise needs array<string>, got ${other.simpleString}")
  }

  private lazy val uniRef = new StringLongMapRef(uni.toArray)
  private lazy val bigRef = new StringLongMapRef(big.toArray)

  override protected def nullSafeEval(input: Any): Any =
    VocabUtil.bigramSurprise(input.asInstanceOf[ArrayData], uniRef, bigRef)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u = ctx.addReferenceObj("uniMap", uniRef, classOf[StringLongMapRef].getName)
    val b = ctx.addReferenceObj("bigMap", bigRef, classOf[StringLongMapRef].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VocabUtil.bigramSurprise($c, $u, $b);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bigram_info(tokens)` → struct(n_bigrams, total_bits): per adjacent
  * pair, the UNCONDITIONAL information content
  * `floor(log2(max(N div c_big(w1 w2), 1)))` bits, where `N` is the
  * total bigram-occurrence count of the model corpus — the integer
  * exponent of the inverse pair frequency p(w1 w2). Differs from
  * [[BigramSurprise]] (conditional p(w2|w1)) in the fallback
  * direction: a pair ABSENT from the (top-K-pruned) table costs the
  * maximum `floor(log2(N))` bits rather than 0 — which is what a
  * cross-model importance weight needs (an unseen-in-target pair must
  * read as "improbable under target", not "free"). Same integer-only
  * discipline: floor(log2) via numberOfLeadingZeros here,
  * `length(bin(x)) - 1` in the oracle.
  */
case class BigramInfo(child: Expression,
                      big: Seq[(String, Long)],
                      n: Long)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("total_bits", LongType, nullable = false)))
  override def prettyName: String = "bigram_info"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bigram_info needs array<string>, got ${other.simpleString}")
  }

  private lazy val bigRef = new StringLongMapRef(big.toArray)

  override protected def nullSafeEval(input: Any): Any =
    VocabUtil.bigramInfo(input.asInstanceOf[ArrayData], bigRef, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bigMap", bigRef, classOf[StringLongMapRef].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VocabUtil.bigramInfo($c, $b, ${n}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VocabUtil {

  private val SPACE = UTF8String.fromString(" ")

  /** Static (codegen-callable) core of [[VocabStats]]. */
  def vocabStats(tokens: ArrayData, vocab: StringSetRef): InternalRow = {
    val m = tokens.numElements()
    var nTok = 0L
    var nOov = 0L
    var i = 0
    while (i < m) {
      if (!tokens.isNullAt(i)) {
        val us = tokens.getUTF8String(i)
        if (us != null && us.numBytes() > 0) {
          nTok += 1L
          if (!vocab.contains(us)) nOov += 1L
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nTok, nOov))
  }

  /** Static (codegen-callable) core of [[BigramSurprise]]. The bigram
    * key is `w1 + " " + w2` — one small concat per pair; documents are
    * row-sized so the allocation is bounded and short-lived. */
  def bigramSurprise(tokens: ArrayData, uni: StringLongMapRef,
                     big: StringLongMapRef): InternalRow = {
    val m = tokens.numElements()
    val ws = new java.util.ArrayList[UTF8String](m)
    var i = 0
    while (i < m) {
      if (!tokens.isNullAt(i)) {
        val us = tokens.getUTF8String(i)
        if (us != null && us.numBytes() > 0) ws.add(us)
      }
      i += 1
    }
    var nBigrams = 0L
    var totalBits = 0L
    var j = 1
    while (j < ws.size()) {
      val w1 = ws.get(j - 1)
      val key = UTF8String.concat(w1, SPACE, ws.get(j))
      val q0 = uni.getOrElse(w1, 1L) / big.getOrElse(key, 1L)
      val q = if (q0 < 1L) 1L else q0
      totalBits += 63 - java.lang.Long.numberOfLeadingZeros(q)
      nBigrams += 1L
      j += 1
    }
    new GenericInternalRow(Array[Any](nBigrams, totalBits))
  }

  /** Static (codegen-callable) core of [[BigramInfo]]. */
  def bigramInfo(tokens: ArrayData, big: StringLongMapRef,
                 n: Long): InternalRow = {
    val m = tokens.numElements()
    val ws = new java.util.ArrayList[UTF8String](m)
    var i = 0
    while (i < m) {
      if (!tokens.isNullAt(i)) {
        val us = tokens.getUTF8String(i)
        if (us != null && us.numBytes() > 0) ws.add(us)
      }
      i += 1
    }
    var nBigrams = 0L
    var totalBits = 0L
    var j = 1
    while (j < ws.size()) {
      val key = UTF8String.concat(ws.get(j - 1), SPACE, ws.get(j))
      val q0 = n / big.getOrElse(key, 1L)
      val q = if (q0 < 1L) 1L else q0
      totalBits += 63 - java.lang.Long.numberOfLeadingZeros(q)
      nBigrams += 1L
      j += 1
    }
    new GenericInternalRow(Array[Any](nBigrams, totalBits))
  }
}

object VocabFunctions {
  def vocabStats(tokens: Column, vocab: Seq[String]): Column =
    GraftInternal.column(VocabStats(GraftInternal.expression(tokens), vocab))

  def bigramSurprise(tokens: Column, uni: Seq[(String, Long)],
                     big: Seq[(String, Long)]): Column =
    GraftInternal.column(
      BigramSurprise(GraftInternal.expression(tokens), uni, big))

  def bigramInfo(tokens: Column, big: Seq[(String, Long)], n: Long): Column =
    GraftInternal.column(
      BigramInfo(GraftInternal.expression(tokens), big, n))
}
