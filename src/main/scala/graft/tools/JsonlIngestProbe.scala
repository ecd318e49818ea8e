package graft.tools

import graft.Tables
import graft.streaming.IngestLoop
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev probe (round 11): the JSONL LANDING-DIRECTORY ingestion path
  * end-to-end at bench scale — the real arrival shape of a corpus
  * pipeline (finished crawl/filter shards dropped into a prefix as
  * gzip JSONL), driven through `Jsonl.readStream` →
  * `IngestLoop.minhashIngest` with one micro-batch per landed shard.
  * q114 oracles the batch round-trip and IngestLoopSpec pins
  * stream == batch; what this probe adds is the TIMING contract at
  * 10×/100×: per-shard micro-batch latency must track O(shard) — flat
  * across batches as the persisted index grows — because each batch
  * appends its own `ingest_batch` partition and mines only
  * batch-touching pairs (never re-reads the corpus side unbucketed).
  *
  * Usage: runMain graft.tools.JsonlIngestProbe <sfDir> [nShards]
  * Emits one JSON line: land/stream wall seconds, per-batch trigger
  * seconds + row counts, accumulated pair count.
  */
object JsonlIngestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nShards = if (args.length > 1) args(1).toInt else 8
    val spark = Tables.session(32)
    spark.sparkContext.setLogLevel("WARN")
    val prefix = "jlp_mh"
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val whFs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(s"${prefix}_bands", s"${prefix}_shingles", s"${prefix}_meta",
        s"${prefix}_tombstones").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(wh, t)
      if (whFs.exists(loc)) whFs.delete(loc, true)
    }
    graft.operators.Fence.forceRelease(spark, prefix)

    val docs = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val landing = java.nio.file.Files.createTempDirectory("jlp_landing").toString
    val t0 = System.nanoTime()
    (0 until nShards).foreach { i =>
      val tmp = java.nio.file.Files.createTempDirectory("jlp_shard").toString
      // one file per shard (the landed-shard shape; maxFilesPerTrigger=1
      // then maps one micro-batch to one shard exactly)
      graft.operators.Jsonl.write(
        docs.filter(pmod(col("doc_id"), lit(nShards)) === i).coalesce(1), tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".json.gz")).head
      val landed = java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(landing, f"shard$i%03d.json.gz"))
      // deterministic arrival order without sleeping (round-11 advisory
      // discipline): explicit distinct mod-time seconds
      java.nio.file.Files.setLastModifiedTime(landed,
        java.nio.file.attribute.FileTime.fromMillis((i + 1) * 1000L))
    }
    val landSec = (System.nanoTime() - t0) / 1e9

    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val pairsDir = java.nio.file.Files.createTempDirectory("jlp_pairs").toString
    val ckpt = java.nio.file.Files.createTempDirectory("jlp_ckpt").toString
    val t1 = System.nanoTime()
    val q = IngestLoop.minhashIngest(
      graft.operators.Jsonl.readStream(spark, landing, schema),
      "doc_id", "text", prefix = prefix, pairsDir = pairsDir,
      checkpointDir = ckpt)
    q.awaitTermination()
    val streamSec = (System.nanoTime() - t1) / 1e9
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    val perBatch = batches.map(p =>
      f"""{"batch":${p.batchId},"sec":${p.durationMs.get("triggerExecution").toDouble / 1000}%.2f,"rows":${p.numInputRows}}""")
      .mkString("[", ",", "]")
    val pairs = spark.read.parquet(pairsDir).count()
    val corpusRows = spark.table(s"${prefix}_shingles").count()
    println(f"""{"probe":"jsonl_ingest","sf":"$sfDir","shards":$nShards,"land_sec":$landSec%.1f,"stream_sec":$streamSec%.1f,"batches":$perBatch,"pairs":$pairs,"indexed_docs":$corpusRows}""")
    spark.stop()
  }
}
