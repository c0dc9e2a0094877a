package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
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

object SetFunctions {
  def inStringSet(c: Column, items: Seq[String]): Column =
    GraftInternal.column(InStringSet(GraftInternal.expression(c), items))
}
