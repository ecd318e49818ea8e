package graft.operators

import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicInteger
import scala.concurrent.{ExecutionContext, Future}

/** Shared bounded executor for driver-side concurrent Spark fits (elbow
  * sweeps, per-segment mining drivers). Submitting one future per
  * (segment | k × restart) on `ExecutionContext.global` was fine at the
  * reference's 3 segments / 15×10 sweep, but a caller with thousands of
  * groups would queue thousands of BLOCKING driver tasks. Here the
  * in-flight count is hard-capped: enough concurrent jobs to keep the
  * Spark scheduler saturated (each individual fit underutilizes the
  * cluster), while excess submissions wait in the pool's queue as plain
  * runnables — no thread, no stack — until a slot frees.
  *
  * Threads are daemons (they never pin the JVM open) and the peak
  * in-flight watermark is recorded so the bounding is spec-testable
  * (FitPoolSpec submits 100 tasks and asserts peak <= parallelism).
  */
private[graft] object FitPool {

  /** In-flight cap: half the driver's cores, clamped to [4, 16]. Each
    * task spends its life blocked in a Spark action, so this bounds
    * concurrent JOBS, not CPU use; 16 concurrent jobs saturate the
    * scheduler well past local[32]. */
  val parallelism: Int =
    math.min(16, math.max(4, Runtime.getRuntime.availableProcessors() / 2))

  private val active = new AtomicInteger(0)
  private val peak = new AtomicInteger(0)

  implicit lazy val ec: ExecutionContext = ExecutionContext.fromExecutor(
    Executors.newFixedThreadPool(parallelism, (r: Runnable) => {
      val t = new Thread(r, "graft-fit-pool")
      t.setDaemon(true)
      t
    }))

  /** Run a fit on the bounded pool, tracking the in-flight watermark. */
  def submit[T](body: => T): Future[T] = Future {
    val now = active.incrementAndGet()
    peak.getAndUpdate(p => math.max(p, now))
    try body finally active.decrementAndGet()
  }(ec)

  def peakActive: Int = peak.get()
  def resetPeak(): Unit = peak.set(0)
}
