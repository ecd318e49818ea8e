package graft

import graft.operators.FitPool
import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.atomic.AtomicInteger
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._

/** The fit-driver concurrency bound: many submissions, capped in-flight. */
class FitPoolSpec extends AnyFunSuite {

  test("100 submissions never exceed the in-flight cap and all complete") {
    FitPool.resetPeak()
    val done = new AtomicInteger(0)
    import FitPool.ec
    val futs = (0 until 100).map { i =>
      FitPool.submit { Thread.sleep(10); done.incrementAndGet(); i }
    }
    val results = Await.result(Future.sequence(futs), 60.seconds)
    assert(results == (0 until 100))
    assert(done.get() == 100)
    assert(FitPool.peakActive >= 2, "tasks should actually overlap")
    assert(FitPool.peakActive <= FitPool.parallelism,
      s"peak in-flight ${FitPool.peakActive} exceeded cap ${FitPool.parallelism} — " +
        "excess submissions must wait in the queue, not occupy threads")
  }

  test("cap is clamped to [4, 16] regardless of core count") {
    assert(FitPool.parallelism >= 4 && FitPool.parallelism <= 16)
  }
}
