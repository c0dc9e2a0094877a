package graft.sinks

import org.apache.spark.sql.DataFrame

/** Parquet writer with the layout controls that matter at 100 TB:
  * partition columns for pruning, in-partition sort for row-group
  * skipping (min/max statistics), and an optional target file count.
  */
object ParquetSink {
  def write(df: DataFrame, dir: String,
            partitionBy: Seq[String] = Nil,
            sortWithin: Seq[String] = Nil,
            files: Option[Int] = None): Unit = {
    val shaped0 = files.fold(df)(n => df.repartition(n))
    val shaped =
      if (sortWithin.nonEmpty)
        shaped0.sortWithinPartitions(sortWithin.map(df.col): _*)
      else shaped0
    val w = shaped.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(dir)
  }
}
