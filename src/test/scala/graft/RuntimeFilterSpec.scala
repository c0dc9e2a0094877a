package graft

import org.apache.spark.sql.functions._

/** Evidence that a selective dim-side predicate turns into a runtime
  * Bloom filter on the fact side (Spark's InjectRuntimeFilter): the
  * fact scan drops non-joining rows BEFORE the shuffle — at 100 TB the
  * difference between shuffling the whole fact table and shuffling the
  * ~0.1% that joins. Thresholds are lowered to trigger at test scale.
  */
class RuntimeFilterSpec extends TestSpark {

  test("selective join injects a bloom filter on the fact side (might_contain)") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // shuffle join
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")

      val orders = Tables(spark, sfDir, "orders")
        .filter(col("o_totalprice") > 300000) // selective creation side
        .select("o_orderkey", "o_totalprice")
      val lineitem = Tables(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_quantity")
      val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"), p)
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
