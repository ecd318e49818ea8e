package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._

/** Dev probe: per-stage wall time of the two-level coarse build at large
  * nlist — driver Lloyd vs sample residuals vs encode projection — to
  * localize the nlist=4096 build cost on the 100× fixture. */
object CoarseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf2")
    val nlist = args.drop(1).headOption.map(_.toInt).getOrElse(4096)
    val spark = Tables.session(16)
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables(spark, dir, "embeddings")
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime; val r = f
      println(f"[coarse] $label: ${(System.nanoTime - s) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { _ =>
      val sample = t("sample collect")(
        graft.operators.Similarity.probeSample(e, "vec_id", "embedding", 16384))
      val cq = t(s"trainCoarse nlist=$nlist")(
        graft.operators.Similarity.trainCoarse(sample, nlist, 42L))
      val resid = t("sample residuals")(sample.map(cq.residual))
      println(s"[coarse] n1=${cq.n1} n2=${cq.n2} resid=${resid.length}")
      val idx = t("full pqIndex")(graft.operators.Similarity.pqIndex(
        e, "vec_id", "embedding", nlist = nlist, m = 16, ksub = 32))
      t("codes count")(idx.codes.count())
    }
    spark.stop()
  }
}
