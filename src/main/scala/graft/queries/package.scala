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
  /** Round 10: dsum runs as [[graft.functions.SumScaled4]] — same
    * exact-integer semantics and bit-identical output doubles, but the
    * accumulator is a primitive two-long 128-bit buffer instead of a
    * BigDecimal-backed DECIMAL(37,4): measured 5.3 s → ~1 s on the
    * sf10 q03 shape (4 sums over 60M rows), where the decimal buffer
    * churn was ~90% of the query. The decimal spelling remains the
    * right tool where decimal VALUES travel mid-plan (window partials,
    * q54's mergeable rollup state, q49's factored products). */
  def dsum(c: Column): Column =
    graft.functions.ExactSumFunctions.sumScaled4(c.cast(DoubleType))
  def davg(c: Column): Column = dsum(c) / count(lit(1))
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
