package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Pipeline, Profiling, Q, Quality, Relational}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Every implemented operator, in SURVEY §2 order. */
  def inventory: Seq[Q] =
    Relational.all ++ Pipeline.all ++ Profiling.all ++ Quality.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    inventory.find(_.name == "q06_multijoin").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    inventory.map(q => q.name -> q.fn).toMap

  /** DuckDB-equivalent SQL for each oracle-checkable query. */
  def oracleSql: Map[String, String] =
    inventory.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
