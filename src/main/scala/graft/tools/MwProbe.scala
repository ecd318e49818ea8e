package graft.tools

import graft.Tables
import graft.streaming.IngestLoop
import org.apache.spark.sql.functions._

/** Dev probe: what multi-writer ingestion does and does NOT buy.
  *
  * Usage: runMain graft.tools.MwProbe <sfDir> [shards]
  *
  * corpus = documents ∪ an id-shifted clone (so true near-dup pairs
  * exist and scatter across shards); `shards` landing files (default 4).
  * Two drains of the SAME corpus through the MinHash family:
  *   single  one loop, one landing dir holding every shard
  *   multi   TWO parallel loops (multiWriter = true), half the shards
  *           each, fence waits enabled — the independent-arrival shape
  * and a row-for-row equality check of the two pair outputs.
  *
  * The honest claim this probe exists to record: multi-writer is an
  * ARRIVAL-TOPOLOGY feature, not a throughput feature. Every batch
  * holds the family fence for its whole write window (that is what
  * makes the commits mapping and the pair contract sound), so two
  * loops on ONE family serialize batch-by-batch — wall-clock `multi`
  * ≈ `single` plus fence-wait overhead, never a 2× speedup. What the
  * second loop buys is operational: two sources push through their own
  * checkpoints with no shared driver process, either can crash/replay
  * without holding the other's arrival queue, and the pair-set/global-
  * partition contracts hold through it (the equality check here;
  * exactly-once argument in [[IngestLoop.resolveGlobalBid]]). Family
  * THROUGHPUT scales by sharding the corpus across family prefixes
  * (or more bands/buckets per batch), not by adding writer loops.
  */
object MwProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val nShards = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    require(nShards % 2 == 0, "shards must be even (half per loop)")
    val spark = Tables.session(32)
    spark.conf.set("spark.graft.fence.waitMs", "600000")
    val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val corpus = docs
      .union(docs.withColumn("doc_id", col("doc_id") + 100000000L))
      .localCheckpoint(true)
    println(s"[mw] corpus=${corpus.count()} shards=$nShards ($dir)")

    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    def stage(df: org.apache.spark.sql.DataFrame, d: String, name: String): Unit = {
      val t = tmp("mw_part")
      df.coalesce(1).write.mode("overwrite").parquet(t)
      val part = new java.io.File(t).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      java.nio.file.Files.copy(part, java.nio.file.Paths.get(d, name))
    }
    def src(d: String) = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1").parquet(d)
    def drop(prefix: String): Unit =
      Seq("bands", "shingles", "meta", "commits")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$t"))
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mw] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ---- single: one loop drains every shard --------------------------
    drop("mw_single")
    val oneDir = tmp("mw_one")
    (0 until nShards).foreach { i =>
      stage(corpus.filter(pmod(col("doc_id"), lit(nShards)) === i), oneDir, s"f$i.parquet")
      Thread.sleep(1100) // distinct mod-time second: one file per trigger
    }
    val onePairs = tmp("mw_one_pairs")
    time(s"single ($nShards batches, one loop)") {
      IngestLoop.minhashIngest(src(oneDir), "doc_id", "text",
        prefix = "mw_single", pairsDir = onePairs,
        checkpointDir = tmp("mw_one_ckpt")).awaitTermination()
    }

    // ---- multi: two parallel loops, half the shards each --------------
    drop("mw_multi")
    val dirA = tmp("mw_a"); val dirB = tmp("mw_b")
    (0 until nShards).foreach { i =>
      stage(corpus.filter(pmod(col("doc_id"), lit(nShards)) === i),
        if (i % 2 == 0) dirA else dirB, s"f${i / 2}.parquet")
      Thread.sleep(1100)
    }
    val twoPairs = tmp("mw_two_pairs")
    time(s"multi  ($nShards batches, TWO parallel loops)") {
      val qa = IngestLoop.minhashIngest(src(dirA), "doc_id", "text",
        prefix = "mw_multi", pairsDir = twoPairs,
        checkpointDir = tmp("mw_a_ckpt"), multiWriter = true)
      val qb = IngestLoop.minhashIngest(src(dirB), "doc_id", "text",
        prefix = "mw_multi", pairsDir = twoPairs,
        checkpointDir = tmp("mw_b_ckpt"), multiWriter = true)
      qa.awaitTermination(); qb.awaitTermination()
    }

    // ---- equality: the two drains produced the same pair set ----------
    val a = spark.read.parquet(onePairs).select("a_id", "b_id", "jaccard")
    val b = spark.read.parquet(twoPairs).select("a_id", "b_id", "jaccard")
    val onlyA = a.exceptAll(b).count(); val onlyB = b.exceptAll(a).count()
    println(s"[mw] pairs single=${a.count()} multi=${b.count()} " +
      s"onlySingle=$onlyA onlyMulti=$onlyB")
    require(onlyA == 0 && onlyB == 0,
      "multi-writer drain diverged from the single-loop drain")
    println("[mw] single == multi row-for-row; multi-writer buys arrival " +
      "independence (own checkpoints, independent crash/replay), " +
      "not family write throughput — the fence serializes batches by design")
    drop("mw_single"); drop("mw_multi")
    spark.stop()
  }
}
