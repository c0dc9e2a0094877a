package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-16 A/B harness for the sf10 weak tail the round-15 verdict
  * left unadjudicated (q51 4.5×, q80 3.7×, q61 2.4×, q06b 2.3×, d15
  * 2.4×): stage each query into floor / subtree / full / candidate-
  * rewrite variants and time them in ONE JVM, so the fix (or the
  * floor note) targets the stage that actually costs.
  * Usage: AbR16 <q51|q80|q61|q06b|d15hash> [iters]
  */
object AbR16 {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("q51")
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
    def liB = {
      val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
      graft.operators.Layout.ensureBucketed(spark,
        graft.Tables(spark, sfDir, "lineitem"),
        s"lineitem_bk$tag", s"/tmp/graft_layout$tag/lineitem",
        buckets = 32, bucketBy = Seq("l_orderkey"))
    }
    def ordB = {
      val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
      graft.operators.Layout.ensureBucketed(spark,
        graft.Tables(spark, sfDir, "orders"),
        s"orders_bk$tag", s"/tmp/graft_layout$tag/orders",
        buckets = 32, bucketBy = Seq("o_orderkey"))
    }

    val variants: Seq[(String, () => DataFrame)] = which match {

      // -- q51_retention: where does the 1.1 s go? -----------------------
      case "q51" => Seq(
        // bare bucketed scan + per-user min (zero exchange)
        "scan_floor" -> (() => evB
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .groupBy("user_id").agg(min("day").as("d0"), count(lit(1)).as("n"))),
        // d0 window only, reduced per user — no cell distinct
        "window_only" -> (() => evB
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .withColumn("d0", min(col("day")).over(Window.partitionBy("user_id")))
          .groupBy("user_id").agg(first("d0").as("d0"), count(lit(1)).as("n"))),
        // full shape but WITHOUT the distinct (counts raw rows per cell)
        "cells_nodistinct" -> (() => evB
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .withColumn("d0", min(col("day")).over(Window.partitionBy("user_id")))
          .groupBy(
            floor(datediff(col("d0"), lit("2024-01-01")) / 7).cast("long").as("cohort_week"),
            floor(datediff(col("day"), col("d0")) / 7).cast("long").as("week_offset"))
          .agg(count(lit(1)).as("n_rows"))),
        // explicit pre-distinct on (cell, user): the (c,o,u) distinct
        // agg is exchange-free on the user buckets; only distinct
        // cells shuffle
        "predistinct" -> (() => evB
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .withColumn("d0", min(col("day")).over(Window.partitionBy("user_id")))
          .select(
            floor(datediff(col("d0"), lit("2024-01-01")) / 7).cast("long").as("cohort_week"),
            floor(datediff(col("day"), col("d0")) / 7).cast("long").as("week_offset"),
            col("user_id"))
          .distinct()
          .groupBy("cohort_week", "week_offset")
          .agg(count(lit(1)).as("n_users"))
          .orderBy("cohort_week", "week_offset")),
        "full" -> (() => graft.SparkEntry.queries("q51_retention")(spark, sfDir)))

      // -- q80_group_outliers: two exact passes vs the scan floor --------
      case "q80" => Seq(
        "scan_floor" -> (() => li
          .select(col("l_returnflag"), col("l_extendedprice"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), max("l_extendedprice").as("m"))),
        // pass 1 alone: the exact (n, Σx, Σx²) decimal aggregate
        "pass1_dsum" -> (() => li
          .groupBy(col("l_returnflag").as("g"))
          .agg(count(lit(1)).as("n"), graft.queries.dsum(col("l_extendedprice")).as("sx"),
            graft.queries.dsum(col("l_extendedprice") * col("l_extendedprice")).as("sxx"))),
        // pass 1 with plain double sums (NOT the contract; cost isolation)
        "pass1_dbl" -> (() => li
          .groupBy(col("l_returnflag").as("g"))
          .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("sx"),
            sum(col("l_extendedprice") * col("l_extendedprice")).as("sxx"))),
        // pass 2 alone: flagging against FIXED literal stats (stats
        // baked once before timing — isolates the second scan + CASE)
        "pass2_only" -> (() => {
          val x = col("l_extendedprice")
          val mean = lit(30000.0); val thr = lit(15000.0)
          li.groupBy(col("l_returnflag"))
            .agg(count(lit(1)).as("n_rows"),
              count(when(abs(x - mean) > thr, 1)).as("n_outliers"))
        }),
        "full" -> (() => graft.SparkEntry.queries("q80_group_outliers")(spark, sfDir)))

      // -- q61_sliding_distinct: distinct vs sweep vs full ----------------
      case "q61" => Seq(
        "distinct_floor" -> (() => evB
          .select(col("user_id"), expr("unix_timestamp(ts) div 600").as("b"))
          .distinct()
          .groupBy("user_id").agg(count(lit(1)).as("n"))),
        "intervals" -> (() => {
          val wU = Window.partitionBy("user_id").orderBy("b")
          val wCum = Window.partitionBy("user_id").orderBy("b")
            .rowsBetween(Window.unboundedPreceding, 0)
          evB.select(col("user_id"), expr("unix_timestamp(ts) div 600").as("b"))
            .distinct()
            .withColumn("prev", lag("b", 1).over(wU))
            .withColumn("ns",
              when(col("prev").isNull || col("b") - col("prev") > 5, 1)
                .otherwise(0))
            .withColumn("seg", sum("ns").over(wCum))
            .groupBy("user_id", "seg")
            .agg((min(col("b")) - 5).as("w_lo"), max(col("b")).as("w_hi"))
        }),
        // candidate rewrite: emit BOTH sweep endpoints from ONE read of
        // the intervals subtree (explode of a 2-element array) instead
        // of the self-union whose branches re-compute it twice
        "sweep_explode" -> (() => {
          val wU = Window.partitionBy("user_id").orderBy("b")
          val wCum = Window.partitionBy("user_id").orderBy("b")
            .rowsBetween(Window.unboundedPreceding, 0)
          val wW = Window.orderBy("w")
          val intervals = evB
            .select(col("user_id"), expr("unix_timestamp(ts) div 600").as("b"))
            .distinct()
            .withColumn("prev", lag("b", 1).over(wU))
            .withColumn("ns",
              when(col("prev").isNull || col("b") - col("prev") > 5, 1)
                .otherwise(0))
            .withColumn("seg", sum("ns").over(wCum))
            .groupBy("user_id", "seg")
            .agg((min(col("b")) - 5).as("w_lo"), max(col("b")).as("w_hi"))
          intervals
            .select(explode(array(
              struct(col("w_lo").as("w"), lit(1L).as("d")),
              struct((col("w_hi") + 1).as("w"), lit(-1L).as("d")))).as("e"))
            .select(col("e.w").as("w"), col("e.d").as("d"))
            .groupBy("w").agg(sum("d").as("d"))
            .withColumn("n_users", sum("d").over(
              wW.rowsBetween(Window.unboundedPreceding, 0)))
            .withColumn("next_w", lead("w", 1).over(wW))
            .filter(col("n_users") > 0)
            .select(explode(expr("sequence(w, coalesce(next_w - 1, w))"))
              .as("wb"), col("n_users"))
            .select((col("wb") * 600).as("w_start"), col("n_users"))
            .orderBy("w_start")
        }),
        "full" -> (() => graft.SparkEntry.queries("q61_sliding_distinct")(spark, sfDir)))

      // -- q06b: co-bucketed star — merge-probe floor ---------------------
      case "q06b" => Seq(
        "li_floor" -> (() => liB
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
          .agg(count(lit(1)).as("n"), max("l_extendedprice").as("m"))),
        "ord_floor" -> (() => ordB
          .select(col("o_orderkey"), col("o_custkey"))
          .agg(count(lit(1)).as("n"), max("o_custkey").as("m"))),
        // the co-bucketed merge join alone: no dims, no decimal revenue
        "join_nodim" -> (() => liB
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
          .join(ordB.select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey") % 100)
          .agg(count(lit(1)).as("n"))),
        // + broadcast dim probe, revenue as plain double (cost isolation)
        "join_dim_dbl" -> (() => {
          val cust = graft.Tables(spark, sfDir, "customer")
            .join(broadcast(graft.Tables(spark, sfDir, "nation")),
              col("c_nationkey") === col("n_nationkey"))
            .join(broadcast(graft.Tables(spark, sfDir, "region")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("c_custkey"), col("r_name"), col("n_name"))
          liB.select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
            .join(ordB.select(col("o_orderkey"), col("o_custkey")),
              col("l_orderkey") === col("o_orderkey"))
            .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
            .groupBy("r_name", "n_name")
            .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
              .as("revenue"), count(lit(1)).as("cnt"))
        }),
        "full" -> (() => graft.SparkEntry.queries("q06b_multijoin_bucketed")(spark, sfDir)))

      // -- d15: is md5-of-text the cost, and what do cheaper content
      //    keys buy? (xxhash64 is NOT DuckDB-replicable — measurement
      //    only; fingerprint IS the house cross-engine 8-byte hash)
      case "d15hash" => Seq(
        "scan_floor" -> (() => docs
          .select(col("source"), col("doc_id"))
          .groupBy("source").agg(count(lit(1)).as("n"), max("doc_id").as("m"))),
        "scan_floor_text" -> (() => docs
          .select(col("source"), col("text"), col("doc_id"))
          .groupBy("source")
          .agg(count(lit(1)).as("n"), max(length(col("text"))).as("m"))),
        "rank_md5" -> (() => docs
          .withColumn("rk", row_number().over(
            Window.partitionBy("source").orderBy(md5(col("text")), col("doc_id"))))
          .groupBy("source").agg(max("rk").as("m"))),
        "rank_xx" -> (() => docs
          .withColumn("rk", row_number().over(
            Window.partitionBy("source").orderBy(xxhash64(col("text")), col("doc_id"))))
          .groupBy("source").agg(max("rk").as("m"))),
        "rank_fp" -> (() => docs
          .withColumn("rk", row_number().over(
            Window.partitionBy("source").orderBy(
              graft.operators.TextAnalysis.fingerprint(col("text")), col("doc_id"))))
          .groupBy("source").agg(max("rk").as("m"))),
        "full" -> (() => graft.SparkEntry.queries("d15_domain_cap")(spark, sfDir)))

      // -- q75: is the widest per-column branch the floor? ----------------
      case "q75" => {
        def branch(c: String) = () => {
          val col0 = col(c)
          li.agg(count(lit(1)).as("n_rows"),
            count(when(col0.isNull, 1)).as("n_null"),
            countDistinct(col0).as("n_distinct"),
            min(col0).as("min_v"), max(col0).as("max_v"),
            graft.queries.dsum(col0).as("sum_v"))
        }
        Seq(
          "branch_qty" -> branch("l_quantity"),
          "branch_price" -> branch("l_extendedprice"),
          "branch_disc" -> branch("l_discount"),
          // the price branch without the distinct (isolate distinct cost)
          "price_nodistinct" -> (() => li.agg(
            count(lit(1)).as("n_rows"),
            count(when(col("l_extendedprice").isNull, 1)).as("n_null"),
            min(col("l_extendedprice")).as("min_v"),
            max(col("l_extendedprice")).as("max_v"),
            graft.queries.dsum(col("l_extendedprice")).as("sum_v"))),
          "full" -> (() => graft.SparkEntry.queries("q75_column_profile")(spark, sfDir)))
      }

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
