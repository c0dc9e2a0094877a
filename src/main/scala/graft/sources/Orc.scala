package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink pair — the second columnar interchange format next
  * to parquet (Hive-ecosystem warehouses hand corpora over as ORC as
  * often as parquet). Spark's native vectorized ORC reader supports
  * the same scan-level machinery the engine's plans rely on: predicate
  * pushdown (min/max + bloom stripe skipping), column pruning, and
  * row-group-granular splits — the OrcSpec pins pushdown and pruning
  * into the scan node so a format switch cannot silently cost a full
  * scan. */
object Orc {
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def write(df: DataFrame, dir: String,
            compression: String = "zstd",
            partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").option("compression", compression)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(dir)
  }
}
