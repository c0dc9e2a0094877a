package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source wrapper: schema-first reads (inference is a full extra
  * pass over the data — at 100 TB always pass the schema), RFC-style
  * quoting, configurable header. */
object Csv {
  def read(spark: SparkSession, path: String,
           schema: Option[StructType] = None,
           header: Boolean = true,
           delimiter: String = ","): DataFrame = {
    val r = spark.read
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("escape", "\"")
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }
}
