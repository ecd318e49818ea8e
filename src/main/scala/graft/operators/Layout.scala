package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Physical-layout operators for the 100-TB path: bucketed tables give
  * co-located, shuffle-free joins and aggregations on the bucket key —
  * the difference between re-shuffling 100 TB per join and reading
  * pre-partitioned files. (The testdata itself is plain parquet; these
  * helpers are how a deployment would lay out the hot join keys, and
  * LayoutSpec proves the join plan drops its exchanges.)
  */
object Layout {

  /** Align a frame's partitioning to its bucket spec before a bucketed
    * write (round 16; guide §6 — small files): an unaligned bucketed
    * write emits one file per (task × bucket) pair, so a 32-partition
    * frame bucketed 8 ways lands 256 files per append — measured 768
    * files holding 6.3 MB after three ingest batches, with every
    * downstream mine paying the listing + per-file open cost and every
    * write paying 256 parquet-writer setups (27 task-seconds for an
    * 83k-row posting append). `repartition(buckets, cols)` routes rows
    * with HashPartitioning's `pmod(murmur3(cols), buckets)` — the SAME
    * function `bucketBy` assigns files with — so each task holds
    * exactly one bucket and each append lands exactly `buckets` files.
    * Content is untouched (pure physical layout); the extra shuffle is
    * what a production bucketed write pays anyway to avoid the
    * tiny-file explosion, and it scales with the frame being written,
    * never the corpus. */
  def bucketAligned(df: DataFrame, buckets: Int, cols: String*): DataFrame =
    if (!df.sparkSession.conf.get("spark.graft.bucketAlign", "true").toBoolean) df
    else df.repartition(buckets, cols.map(c => col(s"`$c`")): _*)

  /** Write as a bucketed managed table (hash-partitioned into `buckets`
    * files per partition by `key`, sorted within buckets). Joins and
    * groupBys on `key` between tables bucketed the same way need no
    * shuffle. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    bucketAligned(df, buckets, key).write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Co-located equi-join of two same-bucketed tables. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
