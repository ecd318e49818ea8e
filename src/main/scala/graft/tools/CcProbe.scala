package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dev tool: the full near-dup GROUPING path under stress — MinHash-LSH
  * pairs over a corpus, then connected components over the real pair
  * set. Run on the zipf 10× fixture (`/tmp/sf1z`) the hot-text clique
  * becomes one giant dense component (~4.3 k docs, ~100 k edges): the
  * celebrity case a 100-TB dedup job actually hits.
  *
  * Usage: runMain graft.tools.CcProbe [dir] [threshold]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1z")
    val threshold = args.drop(1).headOption.map(_.toDouble).getOrElse(0.8)
    val spark = Tables.session(32)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val docs = Tables(spark, dir, "documents")
    val pairs = t("lsh pairs") {
      Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = threshold)
        .select("a_id", "b_id").localCheckpoint(true)
    }
    println(s"[ccprobe] pairs: ${pairs.count()}")
    val comps = t("connected components") {
      Dedup.connectedComponents(pairs, "a_id", "b_id").localCheckpoint(true)
    }
    val stats = comps.groupBy("component").count()
      .agg(count(lit(1)).as("n_components"), max("count").as("largest"),
        sum("count").as("grouped_docs"))
      .head()
    println(s"[ccprobe] components=${stats.getLong(0)} largest=${stats.getLong(1)} " +
      s"grouped_docs=${stats.getLong(2)}")
    spark.stop()
  }
}
