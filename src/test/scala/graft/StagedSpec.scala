package graft

import org.apache.spark.sql.GraftInternal

/** Lifecycle of intra-operator staging caches (round-16, verdict
  * item 6): operators that stage a multi-consumer intermediate (d15's
  * domain counts, q63's vocabulary table, q53's tokenized projection)
  * must not leave persistent RDDs behind once the action that
  * consumes them completes — a long-lived library/REPL session
  * calling them in a loop must not accumulate block-manager scratch.
  * Round 17 moved the gated sites to
  * [[graft.operators.Staged.autoFreeEager]] (a lazy cache was
  * populated cold by whichever consumer stage won the race — A/B'd at
  * −13…−37 % med); the eager variant materializes the cache with its
  * own count() action, whose sweep is absorbed by a one-sweep grace,
  * and the consuming action's end frees the blocks exactly as before.
  */
class StagedSpec extends TestSpark {

  /** Runs the gated query end-to-end (noop sink action) and returns
    * the persistent-RDD ids the run left behind. */
  private def leakedBy(name: String): Set[Int] = {
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    GraftInternal.waitForListeners(spark)
    spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
  }

  test("d15: the staged per-domain count cache frees itself after the " +
       "consuming action — no persistent RDDs left") {
    assert(leakedBy("d15_domain_cap").isEmpty)
  }

  test("q63: the staged (lang, token) vocabulary cache frees itself " +
       "after the consuming action") {
    assert(leakedBy("q63_mi_feature_select").isEmpty)
  }

  test("q53: the staged tokenized-corpus projection (corpus-row-sized " +
       "— the one that MUST not outlive the action) frees itself") {
    assert(leakedBy("q53_shard_pack").isEmpty)
  }

  test("autoFreeEager: the materializing count's own execution end " +
       "does not free the stage (one-sweep grace) — the NEXT " +
       "execution does") {
    import org.apache.spark.sql.functions._
    val staged = graft.operators.Staged.autoFreeEager(
      spark.range(10000).toDF("v").groupBy(col("v") % 13).count())
    GraftInternal.waitForListeners(spark)
    // after the eager count + its sweep, the cache must still be live
    // (a consumer arriving now must read warm blocks, not recompute)
    assert(GraftInternal.stagedCacheLoaded(staged) === Some(true),
      "stage must stay cached past its own materializing action")
    // the consuming action's end frees it
    staged.write.format("noop").mode("overwrite").save()
    GraftInternal.waitForListeners(spark)
    assert(GraftInternal.stagedCacheLoaded(staged).isEmpty,
      "stage must be freed once the consuming action completes")
  }

  test("eagerly staged operators still compute a fresh answer twice " +
       "in a row in one session (new stage per call, not a stale cache)") {
    val q = SparkEntry.queries("d15_domain_cap")
    val a = q(spark, sfDir).collect().map(_.toString).toSeq
    GraftInternal.waitForListeners(spark)
    val b = q(spark, sfDir).collect().map(_.toString).toSeq
    GraftInternal.waitForListeners(spark)
    assert(a === b)
  }

  test("build-but-never-run staged plans do not grow the registry " +
       "without bound (age fallback reclaims them within " +
       "maxAgeExecutions completed executions)") {
    import org.apache.spark.sql.functions._
    val saved = graft.operators.Staged.maxAgeExecutions
    graft.operators.Staged.maxAgeExecutions = 2L
    try {
      val before = graft.operators.Staged.pendingCount
      // Stage three plans and never run them — the un-run-residue path.
      (1 to 3).foreach { i =>
        graft.operators.Staged.autoFree(
          spark.range(100 + i).toDF("v").groupBy(col("v") % 7).count())
      }
      assert(graft.operators.Staged.pendingCount >= before)
      // A handful of unrelated completed executions must age them out.
      (1 to 4).foreach { _ =>
        spark.range(10).toDF("x").write.format("noop").mode("overwrite").save()
        GraftInternal.waitForListeners(spark)
      }
      assert(graft.operators.Staged.pendingCount <= before,
        "aged un-run staged entries must be reclaimed by the sweep")
    } finally graft.operators.Staged.maxAgeExecutions = saved
  }

  test("autoFree on a plan the USER already cached leaves the user's " +
       "cache alive (sameResult CacheManager entry is not stolen)") {
    val user = spark.range(1000).toDF("v").persist()
    try {
      user.count() // materialize the user's cache
      val again = graft.operators.Staged.autoFree(spark.range(1000).toDF("v"))
      again.write.format("noop").mode("overwrite").save()
      GraftInternal.waitForListeners(spark)
      // run one more action so the sweep definitely fired after the
      // staged consumer completed
      spark.range(5).toDF("y").write.format("noop").mode("overwrite").save()
      GraftInternal.waitForListeners(spark)
      assert(user.storageLevel.useMemory,
        "autoFree must not unpersist a pre-existing user cache")
    } finally user.unpersist()
  }
}
