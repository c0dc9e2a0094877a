package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Catalog over a testdata directory: one parquet file per table.
  *
  * Mirrors the reference's create-table-then-query model
  * (/root/reference/src/main.rs:179-212) — except tables are lazy
  * DataFrames over columnar storage instead of row-at-a-time INSERTs,
  * so scans prune columns and push filters down to parquet.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Timestamp columns arrive in whatever physical form the
    // generator's arrow version chose; normalize every one to
    // session-UTC TIMESTAMP (the type watermarks and Timestamp
    // encoders require; the session timezone is pinned to UTC so
    // wall-clock values are unchanged):
    //  - TIMESTAMP(NANOS) events.ts: read as long nanos
    //    (spark.sql.legacy.parquet.nanosAsLong), truncate to micros;
    //  - naive micros (isAdjustedToUTC=false → TIMESTAMP_NTZ): cast.
    val nanosFixed =
      if (name == "events" &&
          df.schema.find(_.name == "ts").exists(_.dataType == LongType))
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else df
    nanosFixed.schema.fields.filter(_.dataType == TimestampNTZType)
      .foldLeft(nanosFixed)((d, f) =>
        d.withColumn(f.name, col(f.name).cast("timestamp")))
  }

  /** Register every table as a temp view so spark.sql(...) works —
    * the engine's equivalent of the reference's SQL prompt surface. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
