package graft

import java.nio.file.Files
import graft.sources.xlsx.XlsxWriter

class XlsxSourceSpec extends TestSpark {
  import spark.implicits._

  /** Fixture mirroring the reference's demo.xlsx shape
    * (service_name + four numeric response-time columns). */
  private lazy val fixture: String = {
    val dir = Files.createTempDirectory("xlsx").toFile
    val p = new java.io.File(dir, "perf.xlsx").getAbsolutePath
    XlsxWriter.write(p, "Sheet1", Seq(
      Seq("service_name", "average_response_time_95_ms", "count",
          "max_response_time_95_ms", "min_response_time_95_ms"),
      Seq("checkout", 12.5, 1000, 99.9, 1.25),
      Seq("search", 8.25, 250000, 50.0, 0.5),
      Seq("login", "n/a", 42, 10.0, 0.1)   // non-numeric cell in numeric col
    ))
    p
  }

  test("reads header, infers string + double columns, nulls bad numerics") {
    val df = spark.read.format("graft.sources.xlsx.XlsxDataSource")
      .option("sheet", "Sheet1").option("path", fixture).load()
    assert(df.columns.toSeq === Seq("service_name", "average_response_time_95_ms",
      "count", "max_response_time_95_ms", "min_response_time_95_ms"))
    val rows = df.orderBy("service_name")
      .as[(String, Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(rows === Seq(
      ("checkout", Some(12.5), Some(1000.0), Some(99.9), Some(1.25)),
      ("login", None, Some(42.0), Some(10.0), Some(0.1)),
      ("search", Some(8.25), Some(250000.0), Some(50.0), Some(0.5))))
  }

  test("coerce=zero reproduces the reference's unwrap_or(0.0) semantics") {
    val df = spark.read.format("graft.sources.xlsx.XlsxDataSource")
      .option("sheet", "Sheet1").option("coerce", "zero")
      .option("path", fixture).load()
    val login = df.filter($"service_name" === "login")
      .select("average_response_time_95_ms").as[Double].head()
    assert(login === 0.0)
  }

  test("column pruning pushes into the reader") {
    val df = spark.read.format("graft.sources.xlsx.XlsxDataSource")
      .option("path", fixture).load()
      .select("service_name")
    assert(df.as[String].collect().toSet === Set("checkout", "search", "login"))
    assert(df.queryExecution.executedPlan.toString.contains("service_name"))
  }

  test("reads the reference's real demo.xlsx (shared-strings path)") {
    val demo = "/root/reference/demo.xlsx"
    assume(new java.io.File(demo).exists())
    val df = spark.read.format("graft.sources.xlsx.XlsxDataSource")
      .option("path", demo).load()
    assert(df.columns.nonEmpty)
    assert(df.count() > 0)
  }

  test("sql over the xlsx table matches the reference demo workflow") {
    val df = spark.read.format("graft.sources.xlsx.XlsxDataSource")
      .option("path", fixture).load()
    df.createOrReplaceTempView("excel_rows")
    val n = spark.sql(
      "SELECT service_name FROM excel_rows WHERE count > 100").count()
    assert(n === 2)
  }

  test("a directory of workbooks reads as one table with one partition per file") {
    // xlsx isn't block-splittable, so parallelism = #files — the
    // documented scale shape: many workbooks → many partitions
    val dir = Files.createTempDirectory("xlsx-many").toFile
    (1 to 3).foreach { i =>
      XlsxWriter.write(new java.io.File(dir, s"part$i.xlsx").getAbsolutePath,
        "Sheet1", Seq(
          Seq("service_name", "count"),
          Seq(s"svc${i}a", i * 10), Seq(s"svc${i}b", i * 10 + 1)))
    }
    val df = spark.read.format("graft.sources.xlsx.XlsxDataSource")
      .option("sheet", "Sheet1").option("path", dir.getAbsolutePath).load()
    assert(df.rdd.getNumPartitions === 3)
    assert(df.count() === 6)
    assert(df.select("service_name").as[String].collect().toSet ===
      Set("svc1a", "svc1b", "svc2a", "svc2b", "svc3a", "svc3b"))
  }
}
