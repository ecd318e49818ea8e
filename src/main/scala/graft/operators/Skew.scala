package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join patterns for the 100-TB shape.
  *
  * AQE's skew-join handling covers sort-merge joins automatically; salting
  * is the explicit fallback when a hot key would still overwhelm one
  * task (e.g., a null-heavy or celebrity key in a shuffle-hash join):
  * the fact side gets a uniform random-ish salt derived deterministically
  * from row identity, the (small) dimension side is exploded across all
  * salt values, and the join key becomes (key, salt) — fanning one hot
  * key's rows across `saltFactor` tasks.
  */
object Skew {

  /** Salted inner equi-join: `fact ⋈ dim` on `key`, with the dim side
    * replicated saltFactor times. Result equals the unsalted join
    * row-for-row. `saltSource` must be a deterministic per-row expression
    * (e.g. a unique id column) so runs are reproducible. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltSource: Column, saltFactor: Int = 8): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(xxhash64(saltSource), lit(saltFactor)))
    val explodedDim = dim.withColumn("__salt",
      explode(expr(s"sequence(0L, ${saltFactor - 1}L)")))
    salted.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
