package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dev probe: incremental connected components vs the naive full re-run
  * — the group-sized consumer's member of the incremental quartet
  * (MinHash IncProbe, embedding EmbedIncProbe, containment
  * ContainIncProbe, SemDeDup SemIncProbe).
  *
  * Usage: runMain graft.tools.CcIncProbe <sfDir> [copies] [shardMod]
  *
  * The corpus graph derives deterministically from the documents table:
  * every doc id anchors a 3-member clone component (d — d+100M — d+200M),
  * id-shifted `copies` times for the ladder (components scale linearly
  * with the corpus). The arriving shard adds one new node + edge to
  * every `shardMod`-th component — the quote-cluster arrival shape:
  * most components untouched, a thin slice re-propagated. Times, warm:
  *   frozen   batch CC over the corpus edges (amortized: the state the
  *            incremental path starts from, built once per corpus)
  *   inc      connectedComponentsIncremental(frozen, shard edges) — the
  *            per-shard cost a production pipeline pays
  *   full     connectedComponents(corpus ∪ shard edges) — the naive
  *            re-run the incremental path replaces
  * The claim being measured: inc tracks the TOUCHED-component count
  * (corpus/shardMod) while full re-pays every component every shard, so
  * the gap widens with both `copies` and `shardMod`. Both paths are
  * equality-checked against each other before timing is trusted.
  */
object CcIncProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val shardMod = args.drop(2).headOption.map(_.toInt).getOrElse(40)
    val spark = Tables.session(32)
    import spark.implicits._
    val baseIds = Tables(spark, dir, "documents").select(col("doc_id"))
    val ids = (0 until copies).map(k =>
      baseIds.select((col("doc_id") + k * 1000000L).as("id")))
      .reduce(_ union _).localCheckpoint(true)
    val corpusEdges = ids.select(col("id").as("a_id"), (col("id") + 100000000L).as("b_id"))
      .union(ids.select(col("id").as("a_id"), (col("id") + 200000000L).as("b_id")))
      .localCheckpoint(true)
    val shardEdges = ids.filter(pmod(col("id"), lit(shardMod)) === 0)
      .select((col("id") + 300000000L).as("a_id"), col("id").as("b_id"))
      .localCheckpoint(true)
    val nComp = ids.count(); val nTouched = shardEdges.count()
    println(s"[ccinc] components=$nComp touched=$nTouched copies=$copies ($dir)")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccinc] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warmup: JIT/codegen for the CC round plan
    Dedup.connectedComponents(corpusEdges.limit(2000), "a_id", "b_id").count()

    val frozen = time("frozen (amortized, once per corpus)") {
      val l = Dedup.connectedComponents(corpusEdges, "a_id", "b_id")
        .localCheckpoint(true)
      l.count(); l
    }
    val inc = time("inc   (per-shard: touched components only)") {
      val l = Dedup.connectedComponentsIncremental(frozen, shardEdges,
        "a_id", "b_id").localCheckpoint(true)
      println(s"[ccinc]   -> ${l.count()} labeled nodes")
      l
    }
    val full = time("full  (naive re-run over corpus + shard)") {
      val l = Dedup.connectedComponents(corpusEdges.union(shardEdges),
        "a_id", "b_id").localCheckpoint(true)
      println(s"[ccinc]   -> ${l.count()} labeled nodes")
      l
    }
    val d1 = inc.exceptAll(full).count(); val d2 = full.exceptAll(inc).count()
    require(d1 == 0 && d2 == 0,
      s"incremental CC diverged from batch-over-union ($d1/$d2 rows)")
    println("[ccinc] equality: incremental == batch-over-union")
    spark.stop()
  }
}
