package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sinks.{CsvExport, ParquetSink}
import graft.sources.{Csv, Jdbc}

class SourceSinkSpec extends TestSpark {
  import spark.implicits._

  test("csv: export then read back round-trips values") {
    val dir = Files.createTempDirectory("csvspec").toString
    val out = s"$dir/nations.csv"
    val src = Tables(spark, sfDir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    CsvExport.exportSingleFile(src.orderBy("n_nationkey"), out)
    val back = Csv.read(spark, out)
    assert(back.count() === src.count())
    assert(back.columns.toSeq === src.columns.toSeq)
    assert(back.agg(sum("n_nationkey")).as[Long].head() ===
      src.agg(sum("n_nationkey")).as[Long].head())
  }

  test("parquet sink: partitionBy creates prunable directories") {
    val dir = Files.createTempDirectory("pqspec").toString + "/orders"
    ParquetSink.write(Tables(spark, sfDir, "orders"), dir,
      partitionBy = Seq("o_orderstatus"), sortWithin = Seq("o_orderdate"))
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("o_orderstatus=")))
    // partition pruning: filter on the partition column reads one dir
    val one = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    val plan = one.queryExecution.executedPlan.toString
    assert(one.count() > 0)
    assert(plan.contains("PartitionFilters"), plan)
  }

  test("jdbc: round-trips a table through embedded Derby " +
       "(batched write, partitioned read)") {
    import org.apache.spark.sql.SaveMode
    val url = "jdbc:derby:memory:graftdb;create=true"
    val src = Tables(spark, sfDir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    Jdbc.write(src, url, "nation_rt", mode = SaveMode.Overwrite)
    val back = Jdbc.read(spark, url, "nation_rt",
      partitionColumn = Some("n_nationkey"),
      lowerBound = 0L, upperBound = 25L, numPartitions = 4)
    assert(back.rdd.getNumPartitions === 4) // bounded read really partitions
    assert(back.count() === src.count())
    assert(back.agg(sum("n_nationkey")).as[Long].head() ===
      src.agg(sum("n_nationkey")).as[Long].head())
  }

  test("ingest: uniqueOrDedup keeps a deterministic winner and reports drops") {
    import graft.sources.Ingest
    val df = Seq(("checkout", 2L), ("checkout", 1L), ("search", 3L))
      .toDF("service_name", "cnt")
    val (deduped, dropped) = Ingest.uniqueOrDedup(df, Seq("service_name"), col("cnt"))
    assert(dropped === 1L)
    assert(deduped.orderBy("service_name").as[(String, Long)].collect().toSeq ===
      Seq(("checkout", 1L), ("search", 3L))) // min tie-break wins
  }

  test("jdbc wrapper: plan construction reaches the driver lookup (no driver jar here)") {
    val e = intercept[Exception] {
      Jdbc.read(spark, "jdbc:sqlite:/tmp/x.db", "t",
        partitionColumn = Some("id"), upperBound = 100L).count()
    }
    // fails at JDBC driver resolution, not inside graft's wrapper
    assert(e.getMessage != null)
  }
}
