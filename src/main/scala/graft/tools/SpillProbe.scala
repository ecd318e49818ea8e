package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Dev probe: memory-pressure behavior of the heavy queries — the one
  * execution axis VERDICT-r9 flagged unmeasured: every local-cluster
  * pin ran 4 GB executors; under 1 GB the collapse/budget paths must
  * DEGRADE TO SPILL, not OOM.
  *
  * Usage: SPARK_GRAFT_MASTER='local-cluster[2,8,1024]' SPARK_SCALA_VERSION=2.13 \
  *          runMain graft.tools.SpillProbe <sfDir> [queryName...]
  *
  * Runs each query to completion with a listener summing the task
  * metrics' memory/disk spill counters, and prints per-query wall,
  * rows, and spill — "completes, row-identical (CompareOut vs a
  * local[32] Verify dump), spill observed" is the BASELINE.md row this
  * produces. Defaults to the q33/q108/q110 heavy set.
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q33_minhash_lsh", "q108_semantic_dedup", "q110_ann_ivfpq_hier")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,8,1024]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster"))
      builder.config("spark.executor.extraClassPath", sys.props("java.class.path"))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mem = new AtomicLong(0L)
    val disk = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        Option(e.taskMetrics).foreach { m =>
          mem.addAndGet(m.memoryBytesSpilled)
          disk.addAndGet(m.diskBytesSpilled)
        }
    })
    val qmap = graft.SparkEntry.queries
    names.foreach { name =>
      mem.set(0L); disk.set(0L)
      val t0 = System.nanoTime()
      val rows = qmap(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; settle before reading
      Thread.sleep(2000)
      println(f"[spill] $name: $wall%.1f s, $rows rows, " +
        f"memSpill=${mem.get / 1048576.0}%.0f MB diskSpill=${disk.get / 1048576.0}%.0f MB " +
        s"($master, $sfDir)")
    }
    spark.stop()
  }
}
