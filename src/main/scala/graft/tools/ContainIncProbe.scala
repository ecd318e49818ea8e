package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dev probe: the CONTAINMENT ingestion scale story in numbers — the
  * quartet's fourth member (MinHash IncProbe, embedding EmbedIncProbe,
  * SimHash spec-pinned, containment here).
  *
  * Usage: runMain graft.tools.ContainIncProbe <sfDir> [shardMod]
  *
  * corpus = every-10th doc (q103/q104's corpus shape); shard =
  * first-half excerpts of every `shardMod`-th corpus doc, id-shifted
  * (q104's shape — every shard doc has containment 1.0 into its
  * source). Times, warm:
  *   index    building the corpus ContainmentIndex (amortized)
  *   inc      containmentJoinIncremental(shard vs index) — per-batch
  *   full     containmentJoin(corpus ∪ shard) — the naive re-run
  * The claim: inc tracks the SHARD while full re-pays the corpus's
  * freq-aggregate + rank-window prefix pipeline every batch.
  */
object ContainIncProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val shardMod = args.drop(1).headOption.map(_.toInt).getOrElse(40)
    val spark = Tables.session(32)
    val corpus = Tables(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0).select(col("doc_id"), col("text"))
    val shard = corpus.filter(pmod(col("doc_id"), lit(shardMod)) === 0)
      .withColumn("__toks", split(col("text"), " "))
      .withColumn("text",
        expr("concat_ws(' ', slice(__toks, 1, CAST(size(__toks) DIV 2 AS INT)))"))
      .select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
    val nC = corpus.count(); val nS = shard.count()
    println(s"[cinc] corpus=$nC shard=$nS ($dir)")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cinc] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warmup: JIT/codegen for the shingle projection + explode
    Dedup.containmentIndex(corpus.limit(2000), "doc_id", "text").posting.count()

    val cIdx = time("index (amortized, once per corpus)") {
      val i = Dedup.containmentIndex(corpus, "doc_id", "text")
      i.posting.count(); i
    }
    val sIdx = time("shard index") {
      val i = Dedup.containmentIndex(shard, "doc_id", "text")
      i.posting.count(); i
    }
    time("inc   (per-batch: shard vs corpus index)") {
      val n = Dedup.containmentJoinIncremental(sIdx, cIdx, tau = 0.5).count()
      println(s"[cinc]   -> $n pairs")
    }
    time("full  (naive re-run over corpus + shard)") {
      val n = Dedup.containmentJoin(corpus.union(shard), "doc_id", "text",
        tau = 0.5).count()
      println(s"[cinc]   -> $n pairs")
    }
    spark.stop()
  }
}
