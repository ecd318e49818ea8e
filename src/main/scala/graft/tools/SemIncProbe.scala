package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Dev probe: the INCREMENTAL SemDeDup scale story in numbers — the
  * semantic member of the [[IncProbe]] family.
  *
  * Usage: runMain graft.tools.SemIncProbe <sfDir> [shardMod]
  *
  * corpus = embeddings; shard = id-shifted clones of every
  * `shardMod`-th vector (default 3 — q111's shape). Times, warm:
  *   index   semIndex over the corpus (amortized: once, NOT per batch)
  *   inc     semanticDedupIncremental(shard vs index) — the per-batch
  *           cost a production curation pipeline pays
  *   full    semanticDedup(corpus ∪ shard) — the naive re-run the
  *           incremental path replaces (re-clusters and re-pairs the
  *           whole corpus every batch)
  * plus the equivalence check: folded incremental decisions == the
  * full batch run (exact under ordered clone arrival — q111's
  * contract), asserted, not assumed.
  */
object SemIncProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val shardMod = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = Tables.session(32)
    val corpus = Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val shard = corpus.filter(pmod(col("vec_id"), lit(shardMod)) === 0)
      .withColumn("vec_id", col("vec_id") + 100000000L)
    val nC = corpus.count(); val nS = shard.count()
    println(s"[sinc] corpus=$nC shard=$nS ($dir)")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sinc] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warmup: JIT/codegen for the cell-assign + dot kernels
    Similarity.semIndex(corpus.limit(2000), "vec_id", "embedding",
      threshold = 0.9, nlist = 16).docs.count()

    val idx = time("index (amortized, once per corpus)") {
      val i = Similarity.semIndex(corpus, "vec_id", "embedding", threshold = 0.9)
      i.copy(docs = i.docs.localCheckpoint(true))
    }
    val dec = time("inc   (per-batch: shard vs corpus index)") {
      val d = Similarity.semanticDedupIncremental(shard, "embedding", idx)
        .localCheckpoint(true)
      println(s"[sinc]   -> ${d.count()} decisions, " +
        s"${d.filter(col("kept")).count()} kept")
      d
    }
    val full = time("full  (naive re-run over corpus + shard)") {
      // same nlist as the index's frozen model — the equivalence
      // contract's precondition (auto-nlist differs on the union)
      val b = Similarity.semanticDedup(corpus.union(shard), "vec_id",
          "embedding", threshold = 0.9, nlist = idx.coarse.nlist)
        .select(col("vec_id").as("id"), col("cell"), col("canonical"), col("kept"))
        .localCheckpoint(true)
      println(s"[sinc]   -> ${b.count()} decisions")
      b
    }
    val folded = idx.union(dec).docs
      .select(col("id"), col("cell"), col("canonical"), col("kept"))
    val diffs = folded.exceptAll(full).count() + full.exceptAll(folded).count()
    println(s"[sinc] equivalence: $diffs diffs (must be 0)")
    require(diffs == 0, "incremental decisions diverge from the batch run")
    spark.stop()
  }
}
