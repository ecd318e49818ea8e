package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join — an operator Spark's DataFrame API lacks
  * natively, composed from built-ins per the preference order (SURVEY
  * §custom-operators: compose first): for each left row, attach the right
  * row with the greatest timestamp <= the left timestamp within the same
  * key.
  *
  * Implementation: tag both sides, union by a common (key, ts) spine,
  * sort within key by (ts, side, tie), and carry the last non-null right
  * payload forward with last(ignoreNulls) over an unbounded-preceding
  * frame; keep left rows. One shuffle on the key — the same cost as a
  * sort-merge join, with no range-explosion. Right rows at exactly the
  * left timestamp match (>= semantics, right side sorts first on ties).
  * The right side must be unique per (key, ts) for determinism — dedupe
  * upstream (e.g. keep max id per key+ts).
  */
object AsOf {

  /** leftTs/rightTs must be the same comparable type (e.g. epoch longs).
    * Returns every left row + `payload` struct of the matched right row
    * (null when no prior right row exists). */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTs: String, rightTs: String): DataFrame = {
    val lCols = left.columns.toSeq
    val l = left.select(
      col(leftKey).as("__k"), col(leftTs).as("__t"), lit(1).as("__side"),
      struct(lCols.map(col): _*).as("__lrow"), lit(null).cast(
        org.apache.spark.sql.types.StructType(right.schema.fields)).as("__rrow"))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTs).as("__t"), lit(0).as("__side"),
      lit(null).cast(org.apache.spark.sql.types.StructType(left.schema.fields)).as("__lrow"),
      struct(right.columns.map(col).toIndexedSeq: _*).as("__rrow"))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("payload", last(col("__rrow"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__lrow.*") +: Seq(col("payload")): _*)
  }

  /** Forward variant: for each left row, the right row with the SMALLEST
    * timestamp >= the left timestamp within the key (next-event lookup).
    * Same union-spine shape, mirrored frame: left sorts before right on
    * ties (so an exactly-simultaneous right row matches), and the first
    * non-null right payload is taken from the current-row-to-end frame. */
  def joinForward(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftTs: String, rightTs: String): DataFrame = {
    val lCols = left.columns.toSeq
    val l = left.select(
      col(leftKey).as("__k"), col(leftTs).as("__t"), lit(0).as("__side"),
      struct(lCols.map(col): _*).as("__lrow"), lit(null).cast(
        org.apache.spark.sql.types.StructType(right.schema.fields)).as("__rrow"))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTs).as("__t"), lit(1).as("__side"),
      lit(null).cast(org.apache.spark.sql.types.StructType(left.schema.fields)).as("__lrow"),
      struct(right.columns.map(col).toIndexedSeq: _*).as("__rrow"))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r)
      .withColumn("payload", first(col("__rrow"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(col("__lrow.*") +: Seq(col("payload")): _*)
  }
}
