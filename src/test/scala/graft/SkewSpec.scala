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
      assert(p.contains("__graft_salt_l"), p)
      assert("Exchange hashpartitioning\\([^)]*__graft_salt".r.findFirstIn(p).isDefined, p)
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

  // one hot key (0, 5000 rows), 50 cold keys (40 rows each), NULL keys
  // on both sides — the routing shape every hot-key-path test uses
  private def skewedLeft = {
    import spark.implicits._
    spark.range(0, 5000)
      .select(lit(0L).as("k"), col("id").as("lid"))
      .unionAll(spark.range(0, 2000)
        .select((col("id") % 50 + 1).as("k"), (col("id") + 5000).as("lid")))
      .unionAll(spark.range(0, 10)
        .select(lit(null).cast("long").as("k"), (col("id") + 7000).as("lid")))
  }
  private def smallRight = {
    import spark.implicits._
    spark.range(0, 51)
      .select(col("id").as("rk"), concat(lit("v"), col("id")).as("v"))
      .unionAll(Seq(("vnull")).toDF("v")
        .select(lit(null).cast("long").as("rk"), col("v")))
  }

  test("hot-key routing: result equals plain join (NULL keys dropped), " +
       "only the hot branch explodes, salted Exchange present") {
    import graft.operators.SkewJoin
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val salted = SkewJoin.saltedJoin(skewedLeft, col("k"), col("lid"),
        smallRight, col("rk"), numSalts = 4, hotKeyThreshold = 1000L)
        .select("lid", "v")
      val plain = skewedLeft.join(smallRight, col("k") === col("rk"))
        .select("lid", "v")
      // inner-join semantics incl. NULL keys: both NULL-key row sets
      // vanish from both results
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
      assert(salted.count() === 5000L * 1 + 2000L * 1) // hot + cold, no NULLs
      val p = salted.queryExecution.executedPlan.toString
      // hot branch shuffles on (key, salt)
      assert(p.contains("__graft_salt_l"), p)
      assert("Exchange hashpartitioning\\([^)]*__graft_salt".r.findFirstIn(p).isDefined, p)
      // hot routing is array membership against the detected set
      assert(p.contains("array_contains"), p)
      // exactly ONE Generate explode in the whole plan — the hot
      // branch's replication; the cold tail must not explode anything
      val explodes = "Generate explode".r.findAllIn(p).size
      assert(explodes === 1, s"expected 1 explode (hot branch only), got $explodes\n$p")
    } finally saved match {
      case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None    => conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("hot-key detection: exactly-threshold is hot, threshold-1 is not, " +
       "and only the genuinely hot key is detected in the routing shape") {
    import graft.operators.SkewJoin
    import spark.implicits._
    // key 7: exactly 1000 rows (boundary, hot); key 8: 999 (cold)
    val boundary = spark.range(0, 1000).select(lit(7L).as("k"))
      .unionAll(spark.range(0, 999).select(lit(8L).as("k")))
    val hot = SkewJoin.hotKeySet(boundary, col("k"), 1000L)
      .as[Long].collect().toSet
    assert(hot === Set(7L), s"threshold boundary misrouted: $hot")
    // the routing fixture: key 0 (5000 rows) is the ONLY hot key at
    // threshold 1000 — cold keys (40 rows) and NULLs never salt
    val detected = SkewJoin.hotKeySet(skewedLeft, col("k"), 1000L)
      .as[Option[Long]].collect().toSet
    assert(detected === Set(Some(0L)), s"hot set should be {0}: $detected")
  }

  test("maxHotKeys cap fails loudly when the threshold is mis-sized") {
    import graft.operators.SkewJoin
    // 3 hot keys but a cap of 2: the first action must raise with a
    // message naming the contract, not silently scan a huge array
    val left = spark.range(0, 3000)
      .select((col("id") % 3).as("k"), col("id").as("lid"))
    val right = spark.range(0, 3).select(col("id").as("rk"))
    val e = intercept[Exception] {
      SkewJoin.saltedJoin(left, col("k"), col("lid"), right, col("rk"),
        numSalts = 4, hotKeyThreshold = 10L, maxHotKeys = 2).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("hotKeyThreshold")), e)
  }
}
