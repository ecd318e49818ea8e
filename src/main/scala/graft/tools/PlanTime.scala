package graft.tools

import graft.SparkEntry

/** Dev tool (round 16): split a catalog query's wall into BUILD
  * (fn() — includes any eager work the query does while constructing
  * its result frame), PLAN (analysis + optimization + physical planning
  * of the returned frame) and EXEC (count), each run twice so the
  * second reading is steady-state. Queries whose fn() executes jobs
  * eagerly (lifecycle rows) show that cost in BUILD.
  *
  * Usage: runMain graft.tools.PlanTime /root/testdata/sf0.1 q33...
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.toSeq
    val spark = graft.Tables.session(32)
    val qs = SparkEntry.queries
    names.foreach { n =>
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        val df = qs(n)(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis->physical
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        println(f"[plantime] $n pass=$pass build=${(t1 - t0) / 1e9}%.2f " +
          f"plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
