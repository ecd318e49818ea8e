package graft.tools

import org.apache.spark.scheduler._
import graft.SparkEntry
import scala.collection.mutable

/** Dev tool (round 16): per-JOB wall breakdown of one catalog query —
  * the headless stand-in for the Spark UI's job table (guide §1.1/§7.1).
  * Registers a listener capturing every job's duration, task count, and
  * the first line of its call site, runs the query once warm, then
  * prints jobs sorted by duration. The long tail of sub-100 ms jobs is
  * summed, not listed.
  *
  * Usage: runMain graft.tools.JobProfile /root/testdata/sf0.1 q139... [warm]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.filterNot(_ == "warm").toSeq
    val warm = args.contains("warm")
    val spark = graft.Tables.session(32)
    val qs = SparkEntry.queries

    case class J(id: Int, var site: String = "", var t0: Long = 0L,
                 var dur: Long = -1L, var tasks: Int = 0, var taskMs: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    val stageToJob = mutable.Map.empty[Int, Int]
    var capture = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (capture) {
        val j = J(e.jobId, Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))).getOrElse(""),
          e.time)
        jobs.synchronized { jobs(e.jobId) = j
          e.stageIds.foreach(s => stageToJob(s) = e.jobId) }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(j => j.dur = e.time - j.t0) }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        jobs.synchronized {
          stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
            j.tasks += 1
            if (e.taskMetrics != null)
              j.taskMs += e.taskMetrics.executorRunTime
          }
        }
    })

    names.foreach { n =>
      if (warm) { try qs(n)(spark, dir).count() catch { case _: Throwable => () } }
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      capture = true
      val t0 = System.nanoTime()
      val cnt = qs(n)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      capture = false
      Thread.sleep(300) // let listener drain
      val all = jobs.synchronized(jobs.values.toVector)
      val thresh = sys.env.getOrElse("PROF_MIN_MS", "100").toLong
      val (big, small) = all.partition(_.dur >= thresh)
      println(f"[prof] $n: wall=$wall%.2f s, rows=$cnt, jobs=${all.size}, " +
        f"jobs<100ms: n=${small.size} sum=${small.map(_.dur.max(0L)).sum / 1e3}%.2f s")
      big.sortBy(-_.dur).foreach { j =>
        println(f"[prof]   job=${j.id}%4d ${j.dur / 1e3}%7.2f s tasks=${j.tasks}%4d " +
          f"taskSum=${j.taskMs / 1e3}%7.2f s  ${j.site.take(70)}")
      }
    }
    spark.stop()
  }
}
