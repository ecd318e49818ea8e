package graft.tools

import graft.SparkEntry

/** Dev tool: time a named subset of catalog queries at a given SF dir.
  * Usage: runMain graft.tools.MicroBench /root/testdata/sf0.1 q35 q44 q45
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.toSeq
    val spark = graft.Tables.session(32)
    val qs = SparkEntry.queries
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = qs(n)(spark, dir).count()
      println(f"[micro] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s ($cnt rows)")
    }
    spark.stop()
  }
}
