package graft.tools

import graft.Tables
import graft.operators.{Similarity, Staging}
import org.apache.spark.sql.functions._

/** Dev probe: the incremental VECTOR-ingestion scale story in numbers —
  * the embedding twin of [[IncProbe]].
  *
  * Usage: runMain graft.tools.EmbedIncProbe <sfDir> [shardMod]
  *
  * corpus = embeddings; shard = id-shifted copies of every
  * `shardMod`-th vector (default 40 — q102's shape). Times, warm:
  *   index    building the corpus EmbedIndex (amortized: once per
  *            corpus, NOT per batch)
  *   inc      lshDupPairsIncremental(shard vs index) — the per-batch
  *            cost a production vector pipeline pays
  *   gate     lshDupMatchCorpus (cross leg only, the online filter)
  *   full     lshDupPairs(corpus ∪ shard) — the naive re-run the
  *            incremental path replaces
  * The claim being measured: inc/gate track the SHARD size while full
  * re-pays the corpus every batch, so the gap widens with scale.
  */
object EmbedIncProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val shardMod = args.drop(1).headOption.map(_.toInt).getOrElse(40)
    val spark = Tables.session(32)
    val corpus = Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val shard = corpus.filter(pmod(col("vec_id"), lit(shardMod)) === 0)
      .withColumn("vec_id", col("vec_id") + 100000000L)
    val nC = corpus.count(); val nS = shard.count()
    println(s"[einc] corpus=$nC shard=$nS ($dir)")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[einc] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warmup: JIT/codegen for the dot kernel + band-key projection
    Similarity.embedIndex(corpus.limit(2000), "vec_id", "embedding", dim = 64)
      .hashed.count()

    val cIdx = time("index (amortized, once per corpus)") {
      val i = Similarity.embedIndex(corpus, "vec_id", "embedding", dim = 64)
      i.hashed.count(); i
    }
    val sIdx = time("shard index") {
      val i = Similarity.embedIndex(shard, "vec_id", "embedding", dim = 64)
      i.hashed.count(); i
    }
    time("inc   (per-batch: shard vs corpus index)") {
      val n = Similarity.lshDupPairsIncremental(sIdx, cIdx, threshold = 0.9).count()
      println(s"[einc]   -> $n pairs")
    }
    time("gate  (online filter, cross leg only)") {
      val n = Similarity.lshDupMatchCorpus(shard, "vec_id", "embedding", cIdx,
        threshold = 0.9).count()
      println(s"[einc]   -> $n pairs")
    }
    time("full  (naive re-run over corpus + shard)") {
      val n = Similarity.lshDupPairs(corpus.union(shard), "vec_id", "embedding",
        threshold = 0.9, dim = 64, staging = Staging.Local).count()
      println(s"[einc]   -> $n pairs")
    }
    spark.stop()
  }
}
