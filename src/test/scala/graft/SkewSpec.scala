package graft

import org.apache.spark.sql.functions._

/** Evidence for SURVEY §4's "AQE skew handling" claim: a deliberately
  * hot join key must show up as a split partition (`skew=true`) in the
  * final adaptive plan. Thresholds are lowered to make the 200k-row hot
  * key register at test scale — at 100 TB the DEFAULT thresholds (256MB
  * partitions, 5× median) trip on the same shape.
  */
class SkewSpec extends TestSpark {

  test("AQE splits a deliberately skewed join key (skew=true in the final plan)") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")

      // one user produces 200k events; 100 others produce ~20 each
      val hot = spark.range(0, 200000)
        .select(lit(0L).as("user_id"), col("id").as("event_id"))
      val uniform = spark.range(0, 2000)
        .select((col("id") % 100 + 1).as("user_id"), (col("id") + 200000).as("event_id"))
      val users = spark.range(0, 101)
        .select(col("id").as("user_id"), concat(lit("u"), col("id")).as("name"))
      val joined = hot.unionAll(uniform).join(users, "user_id")

      // collect() executes THIS dataset's queryExecution (count() would
      // plan a new one and leave `joined`'s adaptive plan unfinalized)
      assert(joined.collect().length === 202000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.contains("skew=true"), plan)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("saltedJoin equals the plain join and shuffles on (key, salt)") {
    import graft.operators.SkewJoin
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      // salting targets the fact-fact case; stop the test-scale orders
      // side from broadcasting so the shuffle partitioning is visible
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val events = Tables(spark, sfDir, "events")
      val orders = Tables(spark, sfDir, "orders")
      val salted = SkewJoin.saltedJoin(events, col("user_id"), col("event_id"),
        orders, col("o_custkey"), numSalts = 8)
        .select("event_id", "o_orderkey")
      val plain = events.join(orders, col("user_id") === col("o_custkey"))
        .select("event_id", "o_orderkey")
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
      // the hot key really scatters: the big side's shuffle partitioning
      // includes the salt column, not just the join key
      val p = salted.queryExecution.executedPlan.toString
      assert(p.contains("__salt_l"), p)
      assert("Exchange hashpartitioning\\([^)]*__salt".r.findFirstIn(p).isDefined, p)
    } finally saved match {
      case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None    => conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("saltedJoin with numSalts=1 degenerates to the plain join") {
    import graft.operators.SkewJoin
    val events = Tables(spark, sfDir, "events").limit(100)
    val orders = Tables(spark, sfDir, "orders")
    val one = SkewJoin.saltedJoin(events, col("user_id"), col("event_id"),
      orders, col("o_custkey"), numSalts = 1)
    val plain = events.join(orders, col("user_id") === col("o_custkey"))
    assert(one.count() === plain.count())
  }
}
