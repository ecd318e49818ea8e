package graft.tools

import graft.Tables
import graft.operators.{Dedup, Staging}
import org.apache.spark.sql.functions._

/** Dev probe: the incremental-ingestion scale story in numbers.
  *
  * Usage: runMain graft.tools.IncProbe <sfDir> [shardMod]
  *
  * corpus = documents; shard = id-shifted copies of every `shardMod`-th
  * doc (default 40 — q101's shape). Times, warm (one throwaway pass of
  * the index build first):
  *   index    building the corpus MinHashIndex (amortized: once per
  *            corpus, NOT per batch)
  *   inc      minhashLshPairsIncremental(shard vs index) — the per-batch
  *            cost a production pipeline pays
  *   gate     minhashLshMatchCorpus (cross leg only, the online filter)
  *   full     minhashLshPairs(corpus ∪ shard) — the naive re-run the
  *            incremental path replaces
  * The claim being measured: inc/gate track the SHARD size while full
  * re-pays the corpus every batch, so the gap widens with scale.
  */
object IncProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val shardMod = args.drop(1).headOption.map(_.toInt).getOrElse(40)
    val spark = Tables.session(32)
    val corpus = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val shard = corpus.filter(pmod(col("doc_id"), lit(shardMod)) === 0)
      .withColumn("doc_id", col("doc_id") + 100000000L)
    val nC = corpus.count(); val nS = shard.count()
    println(s"[inc] corpus=$nC shard=$nS ($dir)")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[inc] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warmup: JIT/codegen for the signature kernel + band explode
    Dedup.minhashIndex(corpus.limit(2000), "doc_id", "text").bands.count()

    val cIdx = time("index (amortized, once per corpus)") {
      val i = Dedup.minhashIndex(corpus, "doc_id", "text")
      i.bands.count(); i
    }
    val sIdx = time("shard index") {
      val i = Dedup.minhashIndex(shard, "doc_id", "text")
      i.bands.count(); i
    }
    time("inc   (per-batch: shard vs corpus index)") {
      val n = Dedup.minhashLshPairsIncremental(sIdx, cIdx, threshold = 0.8).count()
      println(s"[inc]   -> $n pairs")
    }
    time("gate  (online filter, cross leg only)") {
      val n = Dedup.minhashLshMatchCorpus(shard, "doc_id", "text", cIdx, threshold = 0.8).count()
      println(s"[inc]   -> $n pairs")
    }
    time("full  (naive re-run over corpus + shard)") {
      val n = Dedup.minhashLshPairs(corpus.union(shard), "doc_id", "text",
        threshold = 0.8, staging = Staging.Local).count()
      println(s"[inc]   -> $n pairs")
    }
    spark.stop()
  }
}
