package graft.tools

import graft.SparkEntry

/** Dev tool: audit physical plans of catalog queries for the properties
  * that matter at 100 TB — parquet filter pushdown (PushedFilters),
  * column pruning (ReadSchema width), broadcast joins on dim tables,
  * whole-stage codegen coverage, and stray cartesian/nested-loop joins.
  *
  * Usage: runMain graft.tools.PlanAudit /root/testdata/sf0.001 [query...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.catalog.map(_._1)
    val spark = graft.Tables.session(8)
    val qs = SparkEntry.queries
    names.foreach { n =>
      try {
        val plan = qs(n)(spark, dir).queryExecution.executedPlan.toString
        val pushed = "PushedFilters: \\[[^\\]]*[A-Za-z][^\\]]*\\]".r
          .findAllIn(plan).size
        val scans = "Scan parquet".r.findAllIn(plan).size
        val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
        val smj = "SortMergeJoin".r.findAllIn(plan).size
        val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
        val cart = "CartesianProduct".r.findAllIn(plan).size
        val wsc = "WholeStageCodegen".r.findAllIn(plan).size
        val exch = "Exchange".r.findAllIn(plan).size
        println(f"[plan] $n%-24s scans=$scans pushed=$pushed bhj=$bhj smj=$smj bnlj=$bnlj cart=$cart codegen=$wsc exchange=$exch")
      } catch { case e: Exception =>
        println(s"[plan] $n ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
