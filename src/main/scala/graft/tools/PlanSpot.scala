package graft.tools

import graft.SparkEntry

/** Dev tool: print the FINAL adaptive plan (post-execution) of one query. */
object PlanSpot {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val spark = graft.Tables.session(8)
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    println("==== " + name + " final plan ====")
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
