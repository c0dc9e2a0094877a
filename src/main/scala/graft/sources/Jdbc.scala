package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink wrapper — the reference's database side
  * (/root/reference/src/main.rs:87-128 loads rows one INSERT at a
  * time into SQLite; Spark's JDBC sink batches and parallelizes).
  *
  * Scale defaults: partitioned reads (numPartitions + bound column)
  * so a 100 TB-adjacent dimension extract doesn't serialize through
  * one connection, and batched writes (`batchsize`) instead of
  * row-at-a-time statements. Exercised at runtime against embedded
  * Derby (on the Spark classpath) in SourceSinkSpec; any other driver
  * jar just needs to be on the executor classpath.
  */
object Jdbc {

  def read(spark: SparkSession, url: String, table: String,
           partitionColumn: Option[String] = None,
           lowerBound: Long = 0L, upperBound: Long = 1L,
           numPartitions: Int = 8,
           props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("fetchsize", "10000")
    val withPart = partitionColumn.fold(r)(c => r
      .option("partitionColumn", c)
      .option("lowerBound", lowerBound).option("upperBound", upperBound)
      .option("numPartitions", numPartitions))
    props.foldLeft(withPart) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  def write(df: DataFrame, url: String, table: String,
            mode: SaveMode = SaveMode.Append,
            batchSize: Int = 10000,
            props: Map[String, String] = Map.empty): Unit = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    p.setProperty("batchsize", batchSize.toString)
    df.write.mode(mode).jdbc(url, table, p)
  }
}
