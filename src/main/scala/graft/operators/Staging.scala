package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** How multi-consumer intermediate frames (MinHash/SimHash signatures,
  * LSH projections, token-count fits, component labels) are materialized
  * so a self-join or iterative loop doesn't re-run their lineage once
  * per consumer — the round-4 staging rule, made a CALLER CHOICE
  * (round-5, per advisor): `localCheckpoint` is the right default for a
  * single-JVM/local run but is eager at plan-construction time, illegal
  * on streaming DataFrames, and non-fault-tolerant (checkpointed blocks
  * live only on executors — losing one fails the query with no
  * recompute path), which is not the 100-TB deployment story.
  *
  *  - [[Local]] (default): `localCheckpoint(eager)` — cheapest cut of
  *    both lineage and re-execution; single-tenant clusters that accept
  *    recompute-from-scratch on executor loss.
  *  - [[Reliable]]: a real `checkpoint` into `dir` (sets the Spark
  *    checkpoint dir if unset) — blocks survive executor loss; the mode
  *    a 1000-executor deployment wants for hours-long dedup sweeps.
  *  - [[Memory]]: `persist(MEMORY_AND_DISK)` — lineage KEPT (fault
  *    tolerant via recompute), lazy, but each consumer that misses the
  *    cache may still trigger recompute; good middle ground when the
  *    staged frame fits the cache tier.
  *  - [[None]]: pass-through — for streaming plans (no actions allowed
  *    at build time) and callers composing into a larger staged plan.
  *    The quadratic re-execution contract is then the caller's.
  */
object Staging {
  sealed trait Mode { def apply(df: DataFrame): DataFrame }

  /** localCheckpoint(eager = true) — the single-JVM default. */
  case object Local extends Mode {
    def apply(df: DataFrame): DataFrame = df.localCheckpoint(true)
  }

  /** Reliable checkpoint under `dir` (survives executor loss). */
  final case class Reliable(dir: String) extends Mode {
    def apply(df: DataFrame): DataFrame = {
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
      df.checkpoint(true)
    }
  }

  /** persist(MEMORY_AND_DISK): lazy, lineage kept. */
  case object Memory extends Mode {
    def apply(df: DataFrame): DataFrame = df.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** No materialization — streaming-safe pass-through. */
  case object None extends Mode {
    def apply(df: DataFrame): DataFrame = df
  }
}
