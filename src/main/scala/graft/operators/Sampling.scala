package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source-mixing / downsampling operators for training-data pipelines:
  * cap over-represented sources (domains, crawls, shards) at a budget
  * per key, deterministically — re-running the pipeline must select the
  * SAME rows (no RNG; selection is a pure function of the id).
  *
  * Two tiers, same contract as the dedup operators:
  *
  *  - [[capPerKeyHash]] — the 100-TB shape. Keep a row when its Knuth
  *    multiplicative hash falls under `cap/n_key` of the hash range: one
  *    count aggregate + one broadcast join + a codegen'd integer
  *    comparison. No sort, no window, immune to hot-key skew (a
  *    100-billion-row source costs the same per row as a tiny one).
  *    The kept count is binomial around the cap (exact-cap selection is
  *    fundamentally a top-k; see below).
  *  - [[capPerKeyExact]] — exactly min(n, cap) rows per key via a
  *    hash-ranked row_number window. One shuffle on the key; the whole
  *    key's rows pass through one partition, so this is the SMALL-key
  *    tier (eval sets, per-language caps in the thousands) — for
  *    over-represented sources at corpus scale use the hash tier.
  *
  * The selection hash is the q71 curation sampler's Knuth multiplicative
  * hash ((id * 2654435761) mod 2^32) — plain integer SQL both engines
  * compute bit-identically (ids must stay below ~3.4e9 to avoid BIGINT
  * overflow in the product; 64-bit corpora would switch the constant to
  * a splitmix-style 64-bit mix).
  */
object Sampling {

  /** Knuth multiplicative hash of an id column into [0, 2^32). */
  def selectionHash(id: Column): Column =
    pmod(id * lit(2654435761L), lit(4294967296L))

  /** Hash-threshold cap: keep rows whose selection hash falls below
    * cap/n_key of the range. Deterministic, one narrow shuffle (the
    * per-key count), broadcast-joined back, no window. */
  def capPerKeyHash(df: DataFrame, keyCol: String, idCol: String, cap: Long): DataFrame = {
    val counts = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"))
      // integer threshold: cap * 2^32 / n, floored — both engines agree
      .withColumn("__t", expr(s"($cap * 4294967296L) DIV __n"))
    df.join(broadcast(counts), Seq(keyCol))
      .filter(selectionHash(col(idCol)) < col("__t"))
      .drop("__n", "__t")
  }

  /** Exact cap: the min(n, cap) rows with the smallest selection hash
    * (ties broken by id — total order, so re-runs pick identical rows). */
  def capPerKeyExact(df: DataFrame, keyCol: String, idCol: String, cap: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(selectionHash(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }
}
