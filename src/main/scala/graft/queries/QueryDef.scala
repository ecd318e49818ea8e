package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One engine query: the Spark implementation plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL the driver hash-compares against.
  * Column names/aliases MUST match pairwise — the compare sorts columns by
  * name then hashes values.
  */
final case class QueryDef(fn: (SparkSession, String) => DataFrame,
                          oracle: Option[String])

object QueryDef {
  /** Exact, order-independent money sum: cast to DECIMAL before summing so
    * Spark's and DuckDB's different accumulation orders cannot produce
    * different doubles (double summation of 60k ~1e5-sized values drifts
    * ~1e-4 — enough to flip a round()). Decimal addition is exact. DuckDB
    * twin: CAST(SUM(CAST(x AS DECIMAL(18,s)) AS DOUBLE).
    *
    * CAVEAT (measured at 10x sf0.1): the final DECIMAL→DOUBLE cast is a
    * rounding whose tie behavior differs across engines (Spark's
    * BigDecimal path is correctly rounded; DuckDB's int128 conversion
    * can land one ulp off) — the hazard zone is ~(decimal step / double
    * ulp), i.e. acute once the summed magnitude's ulp exceeds the
    * decimal's step. q02 emits its scale-6 charge sums AS DECIMAL for
    * this reason; scale-2 sums below ~1e12 stay safely double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")
}
