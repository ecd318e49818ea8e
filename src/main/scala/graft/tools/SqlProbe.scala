package graft.tools

import graft.Tables

/** Dev tool: run one ad-hoc SQL statement over a testdata dir's tables.
  *
  * Usage: runMain graft.tools.SqlProbe /tmp/sf1z "SELECT l_suppkey, COUNT(*) c
  *        FROM lineitem GROUP BY 1 ORDER BY c DESC LIMIT 5"
  */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = Tables.session(16)
    Tables.names.foreach(t => Tables(spark, dir, t).createOrReplaceTempView(t))
    spark.sql(args.drop(1).mkString(" ")).show(100, truncate = false)
    spark.stop()
  }
}
