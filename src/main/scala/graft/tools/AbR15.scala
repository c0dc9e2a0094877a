package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-15 A/B harness for the weak-tail queries the round-14 verdict
  * flagged (d15_domain_cap 4.9x, q50_funnel 3.4x, q78_weighted_median
  * 4.2x at sf10): stage each query's plan into floor / subtree /
  * full / candidate-rewrite variants and time them in ONE JVM so the
  * fix targets the stage that actually costs, not the one that looks
  * expensive in the plan. Usage: AbR15 <d15|q50|q78> [iters] */
object AbR15 {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("d15")
    val iters = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs = graft.Tables(spark, sfDir, "documents")
    def li = graft.Tables(spark, sfDir, "lineitem")
    def evB = {
      val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
      graft.operators.Layout.ensureBucketed(spark,
        graft.Tables(spark, sfDir, "events"),
        s"events_bk$tag", s"/tmp/graft_layout$tag/events",
        buckets = 32, bucketBy = Seq("user_id"))
    }
    val D4 = org.apache.spark.sql.types.DecimalType(27, 4)

    val variants: Seq[(String, () => DataFrame)] = which match {
      case "d15" => Seq(
        "md5_floor" -> (() => docs
          .select(col("source"), md5(col("text")).as("h"), col("doc_id"))
          .groupBy("source").agg(max("h").as("m"), count(lit(1)).as("n"))),
        "rank_window" -> (() => {
          val byDomain = Window.partitionBy("source")
            .orderBy(md5(col("text")), col("doc_id"))
          docs.withColumn("rk", row_number().over(byDomain))
            .groupBy("source").agg(max("rk").as("m"))
        }),
        "full_noorder" -> (() => graft.operators.Mixing.domainCap(
          docs, "source", col("text"), "doc_id")
          .select(col("source"), col("cap"), col("rk"), col("doc_id"))),
        "full" -> (() => graft.SparkEntry.queries("d15_domain_cap")(spark, sfDir)),
        "full_staged" -> (() => {
          // domainCap with the tiny per-domain count aggregate STAGED
          // (persist) so caps + totals share one corpus scan
          val cnt = docs.groupBy("source").agg(count(lit(1)).as("c_docs"))
            .withColumn("w", floor(sqrt(col("c_docs"))).cast("long"))
            .persist()
          val tot = cnt.agg(sum("w").as("sum_w"), sum("c_docs").as("c_total"))
          val caps = cnt.crossJoin(broadcast(tot))
            .withColumn("cap", greatest(lit(4L),
              expr("((c_total div 2) * w) div sum_w")))
            .select(col("source"), col("cap"))
          val byDomain = Window.partitionBy("source")
            .orderBy(md5(col("text")), col("doc_id"))
          val r = docs.withColumn("rk", row_number().over(byDomain))
            .join(broadcast(caps), "source")
            .filter(col("rk") <= col("cap"))
            .select(col("source"), col("cap"), col("rk"), col("doc_id"))
            .orderBy("source", "rk")
          r
        }))

      case "q50" => Seq(
        "scan_floor" -> (() => evB
          .select("user_id", "event_type", "ts")
          .agg(count(lit(1)).as("n"), max("ts").as("m"))),
        "windows_nodistinct" -> (() => {
          val byUser = Window.partitionBy("user_id")
          evB.withColumn("t1",
              min(when(col("event_type") === "view", col("ts"))).over(byUser))
            .withColumn("t2",
              min(when(col("event_type") === "click" && col("ts") > col("t1"),
                col("ts"))).over(byUser))
            .withColumn("t3",
              min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
                col("ts"))).over(byUser))
            .agg(count(col("t1")).as("a"), count(col("t2")).as("b"),
              count(col("t3")).as("c"))
        }),
        "onepass_fold" -> (() => {
          val fold =
            """aggregate(
              |  sort_array(collect_list(struct(ts, event_type))),
              |  named_struct('t1', CAST(NULL AS TIMESTAMP),
              |               't2', CAST(NULL AS TIMESTAMP),
              |               't3', CAST(NULL AS TIMESTAMP)),
              |  (s, e) -> named_struct(
              |    't1', CASE WHEN s.t1 IS NULL AND e.event_type = 'view'
              |               THEN e.ts ELSE s.t1 END,
              |    't2', CASE WHEN s.t2 IS NULL AND e.event_type = 'click'
              |                AND s.t1 IS NOT NULL AND e.ts > s.t1
              |               THEN e.ts ELSE s.t2 END,
              |    't3', CASE WHEN s.t3 IS NULL AND e.event_type = 'purchase'
              |                AND s.t2 IS NOT NULL AND e.ts > s.t2
              |               THEN e.ts ELSE s.t3 END))""".stripMargin
          evB.groupBy("user_id").agg(expr(fold).as("f"))
            .agg(count(lit(1)).as("n_users"),
              count(col("f.t1")).as("n_view"),
              count(col("f.t2")).as("n_view_click"),
              count(col("f.t3")).as("n_full_funnel"))
        }),
        "windows_reduce" -> (() => {
          val byUser = Window.partitionBy("user_id")
          evB.withColumn("t1",
              min(when(col("event_type") === "view", col("ts"))).over(byUser))
            .withColumn("t2",
              min(when(col("event_type") === "click" && col("ts") > col("t1"),
                col("ts"))).over(byUser))
            .withColumn("t3",
              min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
                col("ts"))).over(byUser))
            .groupBy("user_id")
            .agg(first("t1").as("t1"), first("t2").as("t2"),
              first("t3").as("t3"))
            .agg(count(lit(1)).as("n_users"),
              count(col("t1")).as("n_view"),
              count(col("t2")).as("n_view_click"),
              count(col("t3")).as("n_full_funnel"))
        }),
        "full" -> (() => graft.SparkEntry.queries("q50_funnel")(spark, sfDir)))

      case "q78" => Seq(
        "scan_floor" -> (() => li
          .select(col("l_returnflag"), col("l_extendedprice"),
            col("l_quantity"))
          .groupBy("l_returnflag")
          .agg(sum(col("l_quantity").cast(D4)).as("s"),
            max("l_extendedprice").as("m"))),
        "pass1_only" -> (() => {
          val w = col("l_quantity").cast(D4)
          val bucket = floor(col("l_extendedprice") / 1000.0).cast("long")
          li.groupBy(col("l_returnflag").as("g"), bucket.as("b"))
            .agg(sum(w).as("bw"))
            .groupBy("g").agg(max("bw").as("m"), count(lit(1)).as("n"))
        }),
        "naive_onescan" -> (() => {
          val w = col("l_quantity").cast(D4)
          val cumV = Window.partitionBy("g").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          li.select(col("l_returnflag").as("g"),
              col("l_extendedprice").as("v"), w.as("w0"))
            .groupBy("g", "v").agg(sum("w0").as("vw"))
            .withColumn("cum", sum("vw").over(cumV))
            .withColumn("tot", sum("vw").over(Window.partitionBy("g")))
            .filter(col("cum") * 2 >= col("tot"))
            .groupBy("g").agg(min("v").as("wmedian"))
            .orderBy("g")
        }),
        "naive_longw" -> (() => {
          val cumV = Window.partitionBy("g").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          li.select(col("l_returnflag").as("g"),
              col("l_extendedprice").as("v"),
              col("l_quantity").cast("long").as("w0"))
            .groupBy("g", "v").agg(sum("w0").as("vw"))
            .withColumn("cum", sum("vw").over(cumV))
            .withColumn("tot", sum("vw").over(Window.partitionBy("g")))
            .filter(col("cum") * 2 >= col("tot"))
            .groupBy("g").agg(min("v").as("wmedian"))
            .orderBy("g")
        }),
        "full" -> (() => graft.SparkEntry.queries("q78_weighted_median")(spark, sfDir)),
        "full_longw" -> (() => {
          // the gated two-pass shape with weights as SCALED LONGS
          // (quantity * 10^4 through DECIMAL(18,4), exact): decimal
          // sums leave the hot path
          val w = (col("l_quantity")
            .cast(org.apache.spark.sql.types.DecimalType(18, 4)) * 10000)
            .cast("long")
          val bucket = floor(col("l_extendedprice") / 1000.0).cast("long")
          val cells = li
            .groupBy(col("l_returnflag").as("g"), bucket.as("b"))
            .agg(sum(w).as("bw"))
          val cumB = Window.partitionBy("g").orderBy("b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val bounds = cells
            .withColumn("cum", sum("bw").over(cumB))
            .withColumn("tot", sum("bw").over(Window.partitionBy("g")))
            .filter(col("cum") * 2 >= col("tot"))
            .groupBy("g").agg(
              min_by(struct(col("b"), (col("cum") - col("bw")).as("below"),
                col("tot")), col("b")).as("m"))
            .select(col("g"), col("m.b").as("mb"), col("m.below").as("below"),
              col("m.tot").as("tot"))
            .collect()
          val mbM = map(bounds.toSeq.flatMap(r =>
            Seq(lit(r.getString(0)), lit(r.getLong(1)))): _*)
          val belM = map(bounds.toSeq.flatMap(r =>
            Seq(lit(r.getString(0)), lit(r.getLong(2)))): _*)
          val totM = map(bounds.toSeq.flatMap(r =>
            Seq(lit(r.getString(0)), lit(r.getLong(3)))): _*)
          val cumV = Window.partitionBy("g").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          li.select(col("l_returnflag").as("g"),
              col("l_extendedprice").as("v"), w.as("w0"),
              bucket.as("b"))
            .filter(col("b") === element_at(mbM, col("g")))
            .groupBy(col("g"), col("v"))
            .agg(sum(col("w0")).as("vw"))
            .withColumn("cumv", sum("vw").over(cumV))
            .filter((element_at(belM, col("g")) + col("cumv")) * 2
              >= element_at(totM, col("g")))
            .groupBy("g").agg(min("v").as("wmedian"))
            .withColumnRenamed("g", "l_returnflag")
            .orderBy("l_returnflag")
        }))

      // the weak-tail "is it the scan floor?" ladder: each pair is the
      // gated query vs the bare scan+count of the SAME columns in the
      // same JVM — if full ~= floor, the DuckDB gap is Spark's scan
      // cost at this SF, not plan quality (the AbQ22 protocol)
      case "floors" => Seq(
        "q46_floor" -> (() => li
          .select(col("l_returnflag"), col("l_extendedprice"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), max("l_extendedprice").as("m"))),
        "q46_full" -> (() => graft.SparkEntry.queries("q46_histogram_quantile")(spark, sfDir)),
        "q03_floor" -> (() => li
          .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), max("l_quantity").as("mq"),
            max("l_extendedprice").as("mp"), max("l_discount").as("md"))),
        "q03_full" -> (() => graft.SparkEntry.queries("q03_agg_groupby")(spark, sfDir)),
        "q04_floor" -> (() => li
          .select(col("l_partkey"), col("l_quantity"))
          .groupBy(col("l_partkey") % 100)
          .agg(count(lit(1)).as("n"), max("l_quantity").as("m"))),
        "q04_full" -> (() => graft.SparkEntry.queries("q04_join_broadcast")(spark, sfDir)),
        "q76_floor" -> (() => li
          .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), max("l_quantity").as("mq"),
            max("l_extendedprice").as("mp"))),
        "q76_full" -> (() => graft.SparkEntry.queries("q76_group_linregress")(spark, sfDir)),
        // *_dbl isolate the exact-decimal contract's cost: the same
        // aggregates with plain double sums (NOT the gated semantics —
        // double sums are partitioning-dependent; measurement only)
        "q03_dbl" -> (() => li
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum(col("l_quantity")).as("sum_qty"),
            sum(col("l_extendedprice")).as("sum_base"),
            sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
            avg(col("l_quantity")).as("avg_qty"),
            count(lit(1)).as("cnt"))),
        "q04_dbl" -> (() => li
          .join(broadcast(graft.Tables(spark, sfDir, "part")),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))),
        "q76_dbl" -> (() => {
          val x = col("l_quantity"); val y = col("l_extendedprice")
          li.groupBy(col("l_returnflag"))
            .agg(count(lit(1)).cast("double").as("n"),
              sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
              sum(x * x).as("sxx"), sum(y * y).as("syy"))
        }))

      case other => sys.error(s"unknown target $other")
    }

    variants.foreach { case (name, mk) =>
      mk().write.format("noop").mode("overwrite").save() // warm-up
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(ts.length / 2)
      println(f"$name%-20s samples=${ts.map(t => f"$t%.2f").mkString(",")} median=$med%.3f")
    }
    spark.stop()
  }
}
