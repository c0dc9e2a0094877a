package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band/interval range join — pairs with equal key whose right time
  * falls in `[leftTime, leftTime + window)`.
  *
  * Spark plans a raw inequality join as BroadcastNestedLoopJoin —
  * O(|L|·|R|) per key and a broadcast of a whole side. Bucketing time
  * into window-sized cells turns it into an EQUI-join: a right row in
  * bucket b can only match left rows in buckets {b-1, b}, so the left
  * side probes (key, bucket) and (key, bucket+1). One hash shuffle,
  * linear work, AQE-skew-splittable — the standard band-join trick.
  */
object RangeJoin {

  /** @param leftTime / rightTime numeric (e.g. epoch seconds)
    * @param window   band width in the same unit, > 0 */
  def apply(left: DataFrame, leftKey: Column, leftTime: Column,
            right: DataFrame, rightKey: Column, rightTime: Column,
            window: Long): DataFrame = {
    val l = left.withColumn("__lk", leftKey).withColumn("__lt", leftTime)
      .withColumn("__probe",
        explode(array(floor(col("__lt") / window),
                      floor(col("__lt") / window) + 1)))
    val r = right.withColumn("__rk", rightKey).withColumn("__rt", rightTime)
      .withColumn("__bucket", floor(col("__rt") / window))
    l.join(r, col("__lk") === col("__rk") && col("__probe") === col("__bucket") &&
        col("__rt") >= col("__lt") && col("__rt") < col("__lt") + window)
      .drop("__lk", "__lt", "__probe", "__rk", "__rt", "__bucket")
  }
}
