package graft.tools

import graft.SparkEntry
import java.nio.file.{Files, Paths}

/** Dev tool (round 16): write each named query's `.explain("formatted")`
  * output to `<outDir>/<query>_<tag>.txt` — the committed plan evidence
  * for plans/r16/. Lifecycle queries execute eager stages inside fn();
  * their dumped plan is the final returned frame's (the md notes this).
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <tag> q33...
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(dir, outDir, tag) = args.take(3)
    val names = args.drop(3).toSeq
    val spark = graft.Tables.session(32)
    val qs = SparkEntry.queries
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = qs(n)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${n}_$tag.txt"), plan)
        println(s"[explain] wrote ${n}_$tag.txt (${plan.length} chars)")
      } catch { case e: Throwable =>
        println(s"[explain] $n FAILED: ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
  }
}
