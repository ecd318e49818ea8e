package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dev probe (round 11): q116 quote-cluster stage breakdown.
  * Usage: runMain graft.tools.QcProbe <sfDir>
  */
object QcProbe {
  def main(args: Array[String]): Unit = {
    val d = args.head
    val spark = Tables.session(32)
    spark.sparkContext.setLogLevel("WARN")
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[qcp] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = Tables(spark, d, "documents").filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
    val excerpts = base
      .withColumn("__toks", split(col("text"), " "))
      .withColumn("text",
        expr("concat_ws(' ', slice(__toks, 1, CAST(size(__toks) DIV 2 AS INT)))"))
      .select((col("doc_id") + 20000000L).as("doc_id"), col("text"))
    val corpus = base.union(excerpts)
    val pairs = t("containment+ckpt")(
      Dedup.containmentJoin(corpus, "doc_id", "text", tau = 0.5)
        .select("a_id", "b_id").localCheckpoint(true))
    println(s"[qcp] pairs=${pairs.count()}")
    val comps = t("cc+ckpt")(
      Dedup.connectedComponents(pairs, "a_id", "b_id").localCheckpoint(true))
    val singles = corpus
      .join(comps.select(col("id").as("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id").as("id"), col("doc_id").as("component"))
    t("clusters")(comps.select(col("id"), col("component")).union(singles)
      .groupBy("component")
      .agg(count(lit(1)).cast("int").as("csize"),
        sum("id").as("id_sum"), max("id").as("max_id"))
      .orderBy("component").count())
    spark.stop()
  }
}
