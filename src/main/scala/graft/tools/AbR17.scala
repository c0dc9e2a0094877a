package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 A/B harness for the two >2× sf10 rows that never got a
  * floor ladder (round-16 verdict item 2): stage q60_heavy_hitters
  * and q71_pps_sample into floor / stage / full / candidate-rewrite
  * variants and time them in ONE JVM, so the fix (or the floor note)
  * targets the stage that actually costs.
  *
  * Usage: AbR17 <q60|q71> [iters]   (SPARK_GRAFT_SF_DIR selects SF)
  */
object AbR17 {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("q60")
    val iters = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // q60's two keyed sides, exactly as the gated entry builds them
    def evK = graft.Tables(spark, sfDir, "events").select(
      when(col("event_id") % 3 === 0, lit(1L))
        .otherwise(col("user_id")).as("k"))
    def orK = graft.Tables(spark, sfDir, "orders").select(
      when(col("o_orderkey") % 997 < 3, lit(1L))
        .otherwise(col("o_custkey")).as("k"))

    def docs = graft.Tables(spark, sfDir, "documents")

    val variants: Seq[(String, () => DataFrame)] = which match {

      // -- q60_heavy_hitters: 1.06 s min vs DuckDB 0.217 (4.9×).
      // Two driver actions by design (sketch pass + verify pass over
      // BOTH sides). Where does each second go?
      case "q60" => Seq(
        // one action reading both sides' key column — the scan floor
        "scan_floor" -> (() =>
          evK.unionByName(orK).agg(count(lit(1)).as("n"))),
        // pass 1 alone: tagged union -> per-side (CMS, N) aggregate.
        // (The gated path collect()s these 2 rows; noop-writing them
        // times the same jobs.)
        "pass1_sketch" -> { () =>
          import graft.functions.CmsFunctions
          evK.select(lit("events").as("side"), col("k"))
            .unionByName(orK.select(lit("orders").as("side"), col("k")))
            .groupBy("side")
            .agg(CmsFunctions.cmsAgg(col("k"), 3, 8192, 42L).as("__cms"),
              count(lit(1)).as("n"))
        },
        // pass 2 alone, with the sketches prebuilt OUTSIDE the timer:
        // per-side row-local CMS filter -> candidate-sized exact agg
        "pass2_verify" -> {
          import graft.functions.CmsFunctions
          val sketches = evK.select(lit("events").as("side"), col("k"))
            .unionByName(orK.select(lit("orders").as("side"), col("k")))
            .groupBy("side")
            .agg(CmsFunctions.cmsAgg(col("k"), 3, 8192, 42L).as("__cms"),
              count(lit(1)).as("n"))
            .collect()
            .map(r => r.getString(0) -> (r.getAs[Array[Byte]](1), r.getLong(2)))
            .toMap
          () => Seq(("events", evK, 100L), ("orders", orK, 500L)).map {
            case (lbl, df, phiInv) =>
              val (cms, n) = sketches(lbl)
              val t = math.max(1L, n / phiInv)
              df.select(lit(lbl).as("side"), col("k"))
                .filter(CmsFunctions.cmsEstimate(
                  lit(cms), col("k"), 3, 8192, 42L) >= lit(t))
                .groupBy("side", "k")
                .agg(count(lit(1)).as("exact_cnt"))
                .filter(col("exact_cnt") >= lit(t))
          }.reduce(_ unionByName _)
        },
        // the DuckDB shape as a Spark control: ONE exact pass,
        // |distinct keys|-sized shuffle, thresholds as scalar
        // subqueries — what the sketch exists to avoid at 100 TB
        "exact_control" -> { () =>
          import org.apache.spark.sql.GraftInternal.scalarSubquery
          def side(lbl: String, df: => DataFrame, phiInv: Long) = {
            val t = greatest(lit(1L),
              scalarSubquery(df.agg((count(lit(1)) / phiInv)
                .cast("long").as("t"))))
            df.groupBy("k").agg(count(lit(1)).as("exact_cnt"))
              .filter(col("exact_cnt") >= t)
              .select(lit(lbl).as("side"), col("k"), col("exact_cnt"))
          }
          side("events", evK, 100L).unionByName(side("orders", orK, 500L))
        },
        "full" -> (() =>
          graft.SparkEntry.queries("q60_heavy_hitters")(spark, sfDir)))

      // -- q71_pps_sample: 1.28 s min vs DuckDB 0.166 (7.7×).
      // Two corpus scans (window pass + bucket-offsets aggregate,
      // both re-deriving the md5 order key) + one window-class
      // shuffle. Ladder the scans, the md5, the prefix sum, and a
      // staged-base rewrite that pays the md5/parquet decode ONCE.
      case "q71" => {
        def base = docs
          .select(col("doc_id").as("id"), col("n_chars").cast("long").as("w"))
          .filter(col("w") > 0)
          .withColumn("__ord", md5(col("id").cast("string").cast("binary")))
        Seq(
          // corpus scan of the 2 needed columns — the absolute floor
          "scan_floor" -> (() => docs
            .select(col("doc_id"), col("n_chars"))
            .agg(count(lit(1)).as("n"), sum("n_chars").as("s"))),
          // + the per-row md5 order key (both passes pay this today)
          "md5_scan" -> (() => base.agg(count(lit(1)).as("n"),
            max("__ord").as("m"))),
          // the two-phase distributed prefix sum alone (no grid math)
          "prefix_sum" -> (() => graft.operators.Packing.globalRunningSum(
            base, bucket = substring(col("__ord"), 1, 1),
            ordCols = Seq(col("__ord"), col("id")),
            weight = col("w"), outCol = "__cw", totCol = Some("__t"))
            .agg(max("__cw").as("m"), max("__t").as("t"))),
          // candidate rewrite: stage `base` (Staged.autoFree — the
          // q53 corpus-projection discipline) so the offsets pass
          // reads the cached 3-column frame instead of re-scanning
          // parquet + re-hashing every id
          "staged_base" -> { () =>
            val k = 100
            val b = graft.operators.Staged.autoFree(base)
            val cum = graft.operators.Packing.globalRunningSum(
              b, bucket = substring(col("__ord"), 1, 1),
              ordCols = Seq(col("__ord"), col("id")),
              weight = col("w"), outCol = "__cw", totCol = Some("__t"))
            def g(w: String): String =
              s"CASE WHEN ${2L * k} * ($w) <= __t THEN CAST(0 AS BIGINT) " +
                s"ELSE least(CAST($k AS BIGINT), " +
                s"(${2L * k} * ($w) - __t + 2 * __t - 1) div (2 * __t)) END"
            cum.withColumn("mult",
                (expr(g("__cw")) - expr(g("__cw - w"))).cast("int"))
              .filter(col("mult") > 0)
              .select(col("id").as("doc_id"), col("w"), col("mult"))
              .orderBy("doc_id")
          },
          "full" -> (() =>
            graft.SparkEntry.queries("q71_pps_sample")(spark, sfDir)))
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
