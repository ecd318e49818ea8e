package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Newline-delimited JSON (JSONL) source/sink — the interchange format
  * LLM-corpus pipelines actually ship (crawl dumps, filtered shards,
  * curation outputs are JSONL files, one document object per line).
  *
  * Scale notes: the writer emits ONE FILE PER PARTITION, which is the
  * shard shape that matters at 100 TB — parallelism comes from many
  * files, so the (non-splittable) gzip default costs nothing as long as
  * upstream partitioning is sane; the reader takes an EXPLICIT schema
  * (the S1 discipline: no inference pre-scan — schema inference over a
  * petabyte of JSONL is a full extra pass) and prunes to the requested
  * columns during parsing (Jackson token-skips unrequested fields).
  * String escaping round-trips losslessly (quotes, newlines, unicode —
  * pinned in SinksSpec), so a JSONL hop never perturbs dedup hashes. */
object Jsonl {

  /** Write `df` as JSONL, one object per line, one file per partition;
    * gzip by default (the common shard transport). */
  def write(df: DataFrame, path: String, compress: Boolean = true): Unit = {
    val w = df.write.mode("overwrite")
    (if (compress) w.option("compression", "gzip") else w).json(path)
  }

  /** Read JSONL written by [[write]] (or any newline-delimited JSON)
    * with an explicit schema — a single scan, no inference pass;
    * compression is detected from the file extension. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Streaming twin of [[read]]: watch a LANDING DIRECTORY of JSONL
    * shards — the arrival shape of a real corpus pipeline, where each
    * finished crawl/filter shard is dropped into a prefix — as a
    * Structured Streaming file source (explicit schema, up to
    * `maxFilesPerTrigger` shards per micro-batch). Feeds the
    * [[graft.streaming.IngestLoop]] family directly: each landed shard
    * becomes one indexing/pair-mining micro-batch (pinned end-to-end in
    * IngestLoopSpec). */
  def readStream(spark: SparkSession, path: String, schema: StructType,
                 maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).json(path)
}
