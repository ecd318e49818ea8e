package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch sessionization of event streams (SURVEY §2.11): group events per
  * key into sessions separated by inactivity gaps.
  *
  * Two equivalent formulations:
  *  - [[manualSessions]]: lag + cumulative-sum session ids — plain window
  *    algebra, expressible identically in any SQL engine (used by the
  *    oracle-checked query).
  *  - [[gapSessions]]: Spark's native session_window (also the streaming
  *    form). A test pins that both produce the same session partitioning.
  */
object Sessionize {

  /** Sessions over a long epoch-ordered column (`tsCol`, any monotone
    * unit — the testdata uses epoch nanos), gap in the same unit. */
  def manualSessions(df: DataFrame, keyCol: String, tsCol: String,
                     orderTieCol: String, gap: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(orderTieCol))
    val newSess = when(col(tsCol) - lag(col(tsCol), 1).over(w) > gap
      || lag(col(tsCol), 1).over(w).isNull, 1).otherwise(0)
    df.withColumn("__new", newSess)
      .withColumn("sess_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** Native session_window over a timestamp column (micros precision). */
  def gapSessions(df: DataFrame, keyCol: String, tsCol: String,
                  gapExpr: String): DataFrame =
    df.groupBy(col(keyCol), session_window(col(tsCol), gapExpr).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("sw.start").as("sess_start"),
        col("sw.end").as("sess_end"), col("n_events"))
}
