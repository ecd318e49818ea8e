package graft.tools

import graft.Tables
import graft.operators.{Curation, Staging}
import org.apache.spark.sql.functions._

/** Dev probe: what [[Curation.pipeline]]'s stage staging buys over
  * re-deriving the chain per consumer.
  *
  * Usage: runMain graft.tools.CurationProbe <sfDir>
  *
  * Builds the q126 scenario (benchmark 5-gram plants, exact-dup clones,
  * 20-source uniform mixture) and drives the pipeline twice in the
  * production consumption pattern — per-stage survivor counts (the
  * observability every real curation run reports) PLUS the materialized
  * mixture — once under [[Staging.None]] (every consumer re-derives the
  * chain from the scan: the gate re-filters, the bloom re-builds and
  * re-probes, the dedup re-aggregates) and once under [[Staging.Local]]
  * (each stage cut once, consumers read the checkpoint). The mixture
  * output is checked row-identical between the two runs — staging is a
  * materialization choice, never a semantics choice. */
object CurationProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = Tables.session(32)
    val base = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val bench = base.filter(col("doc_id") % 50 === 0).localCheckpoint(true)
    val aug = base
      .withColumn("bkey", expr("(doc_id DIV 50) * 50"))
      .join(bench.select(col("doc_id").as("bkey"), col("text").as("btext")),
        Seq("bkey"))
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 7 === 3,
          concat(col("text"), lit(" "),
            concat_ws(" ", slice(split(col("btext"), " "), 1, 5))))
          .otherwise(col("text")).as("t"))
      .filter(col("doc_id") % 50 =!= 0)
    val corp = aug.union(aug.filter(col("doc_id") % 9 === 2)
      .withColumn("doc_id", col("doc_id") + 1000000L))
      .localCheckpoint(true)
    println(s"[cur] corpus=${corp.count()} ($dir)")
    val weights = (0 until 20).map(i => s"src$i" -> 1.0).toMap

    def drive(mode: Staging.Mode, label: String): Array[String] = {
      val t0 = System.nanoTime()
      val st = Curation.pipeline(corp, "doc_id", "t", "source",
        weights, budget = 600L, minTokens = 20,
        benchmark = Some(bench.select(col("text").as("t"))),
        staging = mode)
      // the production consumption pattern: stage observability + result
      val g = st.gated.count()
      val c = st.clean.count()
      val u = st.unique.count()
      val out = st.mixed.select("doc_id", "source", "epoch")
        .collect().map(_.toString).sorted
      println(f"[cur] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"(gated=$g clean=$c unique=$u mixed=${out.length})")
      out
    }

    val rederive = drive(Staging.None, "re-derive (Staging.None)")
    val staged = drive(Staging.Local, "staged    (Staging.Local)")
    require(rederive.sameElements(staged),
      "staged mixture diverged from the re-derive run")
    println("[cur] staged == re-derive row-for-row; staging is " +
      "materialization only")
    spark.stop()
  }
}
