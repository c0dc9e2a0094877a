package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

package object queries {

  /** One verifiable operator: a Spark plan plus (optionally) the
    * semantically-identical DuckDB oracle SQL. Column aliases MUST match
    * between the two — the driver sorts columns by name before hashing. */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** Cross-engine-deterministic float aggregation.
    *
    * Raw SUM/AVG over doubles is partition-order-dependent (fp addition
    * is not associative), so the same query can hash differently between
    * Spark and DuckDB — or between two Spark runs. Casting each row to
    * DECIMAL(27,4) first makes the sum exact (inputs carry <=4 decimal
    * digits), and the final cast back to DOUBLE is then identical on any
    * engine. AVG = exact-sum / exact-count, one IEEE division. */
  val D4: DecimalType = DecimalType(27, 4)
  def dsum(c: Column): Column = sum(c.cast(D4)).cast(DoubleType)
  def davg(c: Column): Column = sum(c.cast(D4)).cast(DoubleType) / count(lit(1))
  /** Oracle-side spelling of [[dsum]]/[[davg]].
    *
    * The decimal->double hop goes through VARCHAR because DuckDB's direct
    * `CAST(DECIMAL AS DOUBLE)` double-rounds (hugeint->double, then the
    * scale divide) and lands 1 ULP off Spark's correctly-rounded
    * `BigDecimal.doubleValue` once sums reach ~2^46 (measured at sf1 on
    * the ~1.5B-row skew pair: 76077186492215.75 vs .73). Parsing the
    * exact digit string rounds once, matching Spark bit-for-bit. */
  def sqlSum(x: String): String =
    s"CAST(CAST(SUM(CAST(($x) AS DECIMAL(27,4))) AS VARCHAR) AS DOUBLE)"
  def sqlAvg(x: String): String = s"${sqlSum(x)} / COUNT(*)"

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables(spark, dir, name)
}
