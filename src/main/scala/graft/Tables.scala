package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata (TESTDATA.md). One parquet file per
  * table under the scale-factor dir. All reads go through here so the
  * whole engine shares one place for source-level concerns (schema
  * pinning, the nanos-timestamp workaround, future bucketing/partition
  * layout at 100-TB scale).
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is physically INT64 TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects; sessions set spark.sql.legacy.parquet.nanosAsLong so
    * it arrives as Long (epoch nanos). This loader adds a proper
    * timestamp column `ts_ts` (micros precision) alongside the raw nanos.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events")
      .withColumn("ts_ts", timestamp_micros(expr("ts div 1000")))

  /** Session builder used by tests/tools: mirrors Verify/Bench configs. */
  def session(threads: Int = 8): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // InferFiltersFromGenerate adds a redundant `size(arr) > 0` below
      // every explode; PushDownPredicates then substitutes the full
      // array-building expression into whatever sits below (a join
      // condition in q85, a scan filter in q33/q44) with NO cost guard —
      // for gram/signature arrays built via element_at(__toks, i)
      // lambdas, the inlined copy re-evaluates split() per element:
      // O(tokens²) per row, measured 17.6 s -> ~3 s on q85 at sf0.1.
      // The rule is a prune-empty-rows nicety, never a correctness
      // requirement; excluding it restores the staged-column contract.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
