package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Dev probe: per-stage wall time of the IVF-PQ path (index build split
  * from ADC scoring split from the exact contract leg) to localize q107
  * cost. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.session(args.drop(1).headOption.map(_.toInt).getOrElse(8))
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 50)
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime; val r = f
      println(f"[pq] $label: ${(System.nanoTime - s) / 1e9}%.2f s"); r
    }
    // warmup pass
    Similarity.ivfPqTopK(e, q, "vec_id", "embedding", 10, 16, 6, 16, 32, 8, 42L).count()
    (1 to 2).foreach { _ =>
      val idx = t("pqIndex build")(
        Similarity.pqIndex(e, "vec_id", "embedding", nlist = 16, m = 16, ksub = 32))
      t("codes materialize")(idx.codes.count())
      t("adc+refine topk")(
        Similarity.ivfPqTopK(idx, e, q, "vec_id", "embedding", 10, 6, 8).count())
      t("exact brute leg")(
        Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 10).count())
      t("ivfTopK (vector-rescan tier)")(
        Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 10, nprobe = 6).count())
    }
    (1 to 2).foreach { _ =>
      t("full q107 fn")(
        graft.SparkEntry.queries("q107_ann_ivfpq")(spark, dir).count())
    }
    // round-9 two-level coarse tier: nlist past the single-level trainer's
    // structural cap (sample-bounded), same probed-corpus fraction
    (1 to 2).foreach { _ =>
      val idx4k = t("pqIndex build nlist=4096 (two-level)")(
        Similarity.pqIndex(e, "vec_id", "embedding", nlist = 4096, m = 16, ksub = 32))
      t("codes materialize nlist=4096")(idx4k.codes.count())
      t("adc+refine topk nlist=4096 nprobe=1536")(
        Similarity.ivfPqTopK(idx4k, e, q, "vec_id", "embedding", 10, 1536, 8).count())
      t("adc+refine topk nlist=4096 nprobe=96")(
        Similarity.ivfPqTopK(idx4k, e, q, "vec_id", "embedding", 10, 96, 8).count())
    }
    if (sys.env.contains("PQPROBE_PLAN")) {
      val idx = Similarity.pqIndex(e, "vec_id", "embedding", nlist = 16, m = 16, ksub = 32)
      Similarity.savePqIndex(idx, "pq_dbg", buckets = 8)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = idx.codes.limit(50).select(col("c_id").as("p_id"), col("cell"))
        .join(spark.table("pq_dbg_codes"), Seq("cell"))
      j.count()
      println(j.queryExecution.executedPlan.toString)
      spark.sql("DROP TABLE IF EXISTS pq_dbg_codes")
      spark.sql("DROP TABLE IF EXISTS pq_dbg_meta")
    }
    spark.stop()
  }
}
