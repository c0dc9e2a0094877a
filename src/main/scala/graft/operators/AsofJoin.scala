package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (nearest-past) join — an operator Spark SQL lacks natively.
  *
  * Semantics: for every left row, attach the payload of the latest right
  * row with the same key and `rightTime <= leftTime` (left outer: no
  * match → nulls). Equivalent to DuckDB's `ASOF LEFT JOIN`.
  *
  * Scale design: the naive formulation (range-join then per-left-row
  * max) explodes to O(|L|·|R|) pairs per key. Instead we union both
  * sides into one stream, shuffle ONCE by key, sort within partitions by
  * time, and take a running `last(payload, ignoreNulls)` window — O((|L|
  * +|R|) log) per key, no pair explosion, AQE-skew-splittable.
  */
object AsofJoin {

  /** @param rightPayload right-side columns to carry onto left rows
    * @param rightTieBreak orders right rows that share (key, time); the
    *                      LAST row in this order wins — duplicate right
    *                      timestamps resolve inside the same single
    *                      window pass instead of needing a separate
    *                      dedup shuffle upstream. */
  def apply(
      left: DataFrame, leftKey: Column, leftTime: Column,
      right: DataFrame, rightKey: Column, rightTime: Column,
      rightPayload: Seq[String],
      rightTieBreak: Seq[Column] = Nil): DataFrame = {

    val leftCols = left.columns.toSeq
    // ALL payload columns travel as ONE struct: `last(struct, ignoreNulls)`
    // fills from a single matched right row, so (a) every payload column
    // comes from the SAME right row, and (b) a matched row's genuine
    // NULL payload values are preserved (per-column last-non-null would
    // carry forward stale values from older right rows independently).
    // One window pass regardless of payload width.
    val pType = StructType(rightPayload.map(c => right.schema(c)))
    // tie-break expressions are right-side-only: materialize them as
    // hidden columns (null on left rows) so the window can sort on them
    // after the union
    val tbNames = rightTieBreak.indices.map(i => s"__tb$i")
    val rWithTb = rightTieBreak.zip(tbNames).foldLeft(right) {
      case (df, (c, n)) => df.withColumn(n, c)
    }
    val lTagged = left
      .withColumn("__k", leftKey).withColumn("__t", leftTime)
      .withColumn("__is_left", lit(1))
      .select(Seq(col("__k"), col("__t"), col("__is_left")) ++
        leftCols.map(col) ++
        tbNames.map(n => lit(null).cast(rWithTb.schema(n).dataType).as(n)) :+
        lit(null).cast(pType).as("__p"): _*)
    val rTagged = rWithTb
      .withColumn("__k", rightKey).withColumn("__t", rightTime)
      .withColumn("__is_left", lit(0))
      .select(Seq(col("__k"), col("__t"), col("__is_left")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        tbNames.map(col) :+
        struct(rightPayload.map(col): _*).as("__p"): _*)

    // Right rows sort before left rows at equal time → `<=` semantics;
    // among right rows at equal time the tie-break ASC puts the winner
    // last (left rows carry nulls there — asc_nulls_first keeps them
    // from interleaving into the right-row order).
    val w = Window.partitionBy("__k")
      .orderBy(Seq(col("__t"), col("__is_left")) ++
        tbNames.map(col(_).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col("__p").getField(c).as(c)): _*)
  }
}
