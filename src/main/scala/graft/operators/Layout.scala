package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout operators for the 100-TB path: bucketed tables give
  * co-located, shuffle-free joins and aggregations on the bucket key —
  * the difference between re-shuffling 100 TB per join and reading
  * pre-partitioned files. (The testdata itself is plain parquet; these
  * helpers are how a deployment would lay out the hot join keys, and
  * LayoutSpec proves the join plan drops its exchanges.)
  */
object Layout {

  /** Write as a bucketed managed table (hash-partitioned into `buckets`
    * files per partition by `key`, sorted within buckets). Joins and
    * groupBys on `key` between tables bucketed the same way need no
    * shuffle. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Co-located equi-join of two same-bucketed tables. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
