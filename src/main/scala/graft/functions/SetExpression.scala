package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** O(1) membership test against a driver-materialized string set that
  * rides as a plan REFERENCE OBJECT, not as inlined literals.
  *
  * This is the scale-safe form of `col.isin(...)`/`array_contains(
  * array(lit...))` for sets produced by a previous job (d16's hot
  * boilerplate segments, d09-style small-side keys): those forms
  * linear-scan the list per row AND splice every element into the
  * generated code / task binary, so cost and code size grow with the
  * set. Measured on d16 at sf10: the corpus-wide hot set grows with
  * corpus size (128 → 12.8k segments across two decades) and the
  * array_contains formulation went 2.1 s → 121 s — the set lookup,
  * not the data, had become the plan. With a hashed reference object
  * the probe is O(1), the generated code is one call, and the task
  * binary carries the set once in serialized form.
  */
final class StringSetRef(items: Array[String]) extends Serializable {
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](items.length * 2)
    items.foreach(i => s.add(UTF8String.fromString(i)))
    s
  }
  def contains(v: UTF8String): Boolean = set.contains(v)
}

/** `in_string_set(col)` — true iff the column value is in the set. */
case class InStringSet(child: Expression, items: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "in_string_set"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"in_string_set needs string, got ${other.simpleString}")
  }

  private lazy val ref = new StringSetRef(items.toArray)

  override protected def nullSafeEval(input: Any): Any =
    ref.contains(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("strSet", ref, classOf[StringSetRef].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $r.contains($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The 8-bytes-per-entry sibling of [[StringSetRef]] for sets keyed by
  * a 64-bit fingerprint instead of the string itself. At 100 TB the
  * d16-class hot set grows linearly with the corpus (measured 128 →
  * 12.8k segments across sf0.1 → sf10, extrapolating to ~10⁸ at
  * 100 TB); carrying segment TEXT puts GBs on the driver and in every
  * task's plan reference, while 64-bit fingerprints cap the per-entry
  * cost at 8 bytes — a ~50× byte reduction on typical 8-token
  * segments — and make the probe an open-addressed primitive lookup
  * with no UTF8String equality walk. */
final class LongSetRef(items: Array[Long]) extends Serializable {
  // open-addressed table, power-of-two capacity, linear probing; 0 is
  // remapped (xxhash64 emits 0 with probability 2^-64 — remap keeps
  // the empty-slot sentinel sound instead of betting on it)
  @transient private lazy val table: Array[Long] = {
    var cap = 16
    while (cap < items.length * 2) cap <<= 1
    val t = new Array[Long](cap)
    items.foreach { v0 =>
      val v = if (v0 == 0L) GraftLongSet.ZeroSub else v0
      var i = java.lang.Long.hashCode(v) & (cap - 1)
      while (t(i) != 0L && t(i) != v) i = (i + 1) & (cap - 1)
      t(i) = v
    }
    t
  }
  def contains(v0: Long): Boolean = {
    val v = if (v0 == 0L) GraftLongSet.ZeroSub else v0
    val t = table
    val mask = t.length - 1
    var i = java.lang.Long.hashCode(v) & mask
    while (t(i) != 0L) {
      if (t(i) == v) return true
      i = (i + 1) & mask
    }
    false
  }
}

private[functions] object GraftLongSet {
  // any fixed non-zero value works: membership only needs the remap to
  // be a bijection on {0, ZeroSub}, and ZeroSub itself colliding with a
  // real key is the same 2^-64 event as any other fingerprint collision
  val ZeroSub: Long = 0x9e3779b97f4a7c15L
}

/** `in_long_set(col)` — true iff the 64-bit column value is in the set. */
case class InLongSet(child: Expression, items: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "in_long_set"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"in_long_set needs bigint, got ${other.simpleString}")
  }

  private lazy val ref = new LongSetRef(items)

  override protected def nullSafeEval(input: Any): Any =
    ref.contains(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("longSet", ref, classOf[LongSetRef].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $r.contains($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SetFunctions {
  def inStringSet(c: Column, items: Seq[String]): Column =
    GraftInternal.column(InStringSet(GraftInternal.expression(c), items))

  def inLongSet(c: Column, items: Array[Long]): Column =
    GraftInternal.column(InLongSet(GraftInternal.expression(c), items))
}
