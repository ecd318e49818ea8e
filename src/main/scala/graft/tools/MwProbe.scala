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
  * Round 13's honest record was that the whole-batch fence made
  * multi-writer an arrival-topology feature only (multi ≈ single —
  * two loops on one family serialized batch-by-batch). Round 14
  * narrowed the fence to bid-resolution + append: the corpus-sized
  * pair-mining leg now runs UNFENCED under the family-generation
  * check ([[IngestLoop]] `mineAndPublish`), so two loops on ONE
  * family overlap their mining legs — this probe records how much of
  * the batch wall-clock that overlap actually recovers (the append
  * windows still serialize, and on a shared local[32] JVM the two
  * mines also share cores, so the honest expectation is multi
  * substantially below single, approaching the mining fraction of
  * the batch, not an idealized 2×). The pair-set equality check
  * below is the part that must never move: overlapped mining still
  * yields row-for-row the single-loop pair set (exactly-once
  * argument in [[IngestLoop.resolveGlobalBid]]).
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
    println("[mw] single == multi row-for-row; the narrowed fence (round 14) " +
      "overlaps the two loops' unfenced mining legs — only bid-resolution + " +
      "append serialize — with the pair contract intact")
    drop("mw_single"); drop("mw_multi")

    // ---- signature (media) family arm (round 16): q138's landing path
    // claims the multiWriter machinery by REUSE of the chunked family —
    // this rung gives the claim its own measurement: two parallel
    // signatureIngest loops on ONE family == one loop, row-for-row.
    def dropSig(prefix: String): Unit =
      Seq("chunked", "meta", "commits")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$t"))
    val sigs = corpus.select(col("doc_id").as("media_id"),
      graft.operators.Dedup.simhash64("split(text, ' ')").as("sig"))
      .localCheckpoint(true)
    def sigSrc(d: String) = spark.readStream.schema("media_id LONG, sig LONG")
      .option("maxFilesPerTrigger", "1").parquet(d)
    dropSig("mw_sig1")
    val sOneDir = tmp("mw_s1")
    (0 until nShards).foreach { i =>
      stage(sigs.filter(pmod(col("media_id"), lit(nShards)) === i), sOneDir, s"f$i.parquet")
      Thread.sleep(1100)
    }
    val sOnePairs = tmp("mw_s1_pairs")
    time(s"signature single ($nShards batches, one loop)") {
      IngestLoop.signatureIngest(sigSrc(sOneDir), "media_id", "sig",
        prefix = "mw_sig1", pairsDir = sOnePairs,
        checkpointDir = tmp("mw_s1_ckpt")).awaitTermination()
    }
    dropSig("mw_sig2")
    val sDirA = tmp("mw_sa"); val sDirB = tmp("mw_sb")
    (0 until nShards).foreach { i =>
      stage(sigs.filter(pmod(col("media_id"), lit(nShards)) === i),
        if (i % 2 == 0) sDirA else sDirB, s"f${i / 2}.parquet")
      Thread.sleep(1100)
    }
    val sTwoPairs = tmp("mw_s2_pairs")
    time(s"signature multi  ($nShards batches, TWO parallel loops)") {
      val qa = IngestLoop.signatureIngest(sigSrc(sDirA), "media_id", "sig",
        prefix = "mw_sig2", pairsDir = sTwoPairs,
        checkpointDir = tmp("mw_sa_ckpt"), multiWriter = true)
      val qb = IngestLoop.signatureIngest(sigSrc(sDirB), "media_id", "sig",
        prefix = "mw_sig2", pairsDir = sTwoPairs,
        checkpointDir = tmp("mw_sb_ckpt"), multiWriter = true)
      qa.awaitTermination(); qb.awaitTermination()
    }
    val sa = spark.read.parquet(sOnePairs).select("a_id", "b_id", "hamming")
    val sb = spark.read.parquet(sTwoPairs).select("a_id", "b_id", "hamming")
    val sOnlyA = sa.exceptAll(sb).count(); val sOnlyB = sb.exceptAll(sa).count()
    println(s"[mw] signature pairs single=${sa.count()} multi=${sb.count()} " +
      s"onlySingle=$sOnlyA onlyMulti=$sOnlyB")
    require(sOnlyA == 0 && sOnlyB == 0,
      "signature multi-writer drain diverged from the single-loop drain")
    println("[mw] signature single == multi row-for-row — the media landing " +
      "path's multiWriter claim measured on its own family")
    dropSig("mw_sig1"); dropSig("mw_sig2")
    spark.stop()
  }
}
