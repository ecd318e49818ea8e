package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Dev probe: measure q44 (LSH) and q46 (IVF) recall against the exact
  * brute-force top-k at a given sf dir, to calibrate the recall bounds
  * the catalog queries pin as oracle-checkable invariants. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Tables.session(8)
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables(spark, dir, "embeddings")

    def recall(ann: org.apache.spark.sql.DataFrame,
               exact: org.apache.spark.sql.DataFrame, k: Int): Unit = {
      val hits = ann.join(exact, Seq("q_id", "c_id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("nh"))
      val ex = exact.groupBy("q_id").agg(count(lit(1)).as("ne"))
      val rec = ex.join(hits, Seq("q_id"), "left")
        .select((coalesce(col("nh"), lit(0L)).cast("double") /
          least(col("ne"), lit(k.toLong))).as("r"))
      val row = rec.agg(avg("r").as("mean"), min("r").as("min"),
        count(lit(1)).as("nq")).head()
      println(f"[probe] mean=${row.getDouble(0)}%.4f min=${row.getDouble(1)}%.4f nq=${row.getLong(2)}")
    }

    val c500 = e.filter(col("vec_id") < 500)
    val annLsh = Similarity.lshTopK(c500, "vec_id", "embedding", k = 5)
      .select("q_id", "c_id")
    val exact500 = Similarity.bruteForceTopK(c500, c500, "vec_id", "embedding", k = 5)
      .select("q_id", "c_id")
    print("[probe] q44 lsh k=5: "); recall(annLsh, exact500, 5)

    val q5 = e.filter(col("vec_id") < 50)
    val annIvf = Similarity.ivfTopK(e, q5, "vec_id", "embedding", k = 10, nprobe = 6)
      .select("q_id", "c_id")
    val exactQ5 = Similarity.bruteForceTopK(e, q5, "vec_id", "embedding", k = 10)
      .select("q_id", "c_id")
    print("[probe] q46 ivf k=10: "); recall(annIvf, exactQ5, 10)

    // nlist 16 = the q107 default (single-level coarse); nlist >= 4096
    // exercises the round-9 two-level trainer + beam probe at the scale
    // the old single-level trainer could not reach (nprobe scaled to
    // keep the probed corpus fraction comparable). The two extra arms
    // DECOMPOSE the recall loss (round 15): refine=64 removes ADC
    // ranking error (what's left is coarse-probing misses); nprobe=16
    // removes probing misses (what's left is ADC error at the refine
    // cut) — the lift work must target whichever dominates.
    for ((nlist, nprobe, m, ksub, refine) <- Seq(
        (16, 6, 16, 32, 8), (16, 6, 16, 32, 64), (16, 16, 16, 32, 8),
        (4096, 1536, 16, 32, 8), (16384, 6144, 16, 32, 8))) {
      val annPq = Similarity.ivfPqTopK(e, q5, "vec_id", "embedding",
          k = 10, nlist = nlist, nprobe = nprobe, m = m, ksub = ksub,
          refine = refine, seed = 42L)
        .select("q_id", "c_id")
      print(s"[probe] q107 ivfpq k=10 nlist=$nlist nprobe=$nprobe m=$m ksub=$ksub refine=$refine: ")
      recall(annPq, exactQ5, 10)
    }

    // MULTI-ASSIGNMENT ladder (round 15): each vector indexed in its
    // top-a cells, same probed cell fraction (nprobe=6/16) — the lever
    // the decomposition above supports (the loss is boundary vectors in
    // unprobed cells, not ADC error)
    for (a <- Seq(2, 3)) {
      val idx = Similarity.pqIndex(e, "vec_id", "embedding",
        nlist = 16, m = 16, ksub = 32, seed = 42L, assign = a)
      val annMa = Similarity.ivfPqTopK(idx, e, q5, "vec_id", "embedding",
          k = 10, nprobe = 6, refine = 8)
        .select("q_id", "c_id")
      print(s"[probe] q107 ivfpq k=10 nlist=16 nprobe=6 assign=$a: ")
      recall(annMa, exactQ5, 10)
    }

    // ATTRIBUTE-FILTERED ladder (round 16, q141): candidates restricted
    // to vec_id % 4 == 1 BEFORE the ADC scan; recall vs the FILTERED
    // brute force. The three arms show what the survivor-floor widening
    // buys at a starved nprobe: (a) widening off (nprobeMax pins the
    // probe set), (b) widening on, (c) generous fixed nprobe as the
    // ceiling reference.
    val pred = pmod(col("vec_id"), lit(4)) === 1
    val fids = e.filter(pred).select("vec_id")
    val exactF = Similarity.bruteForceTopK(e.filter(pred), q5,
      "vec_id", "embedding", k = 10).select("q_id", "c_id")
    val idxF = Similarity.pqIndex(e, "vec_id", "embedding",
      nlist = 16, m = 16, ksub = 32, seed = 42L, assign = 2)
    for ((label, np, npMax) <- Seq(
        ("nprobe=2 widening OFF", 2, 2),
        ("nprobe=2 widening ON ", 2, -1),
        ("nprobe=8 fixed        ", 8, 8))) {
      val annF = Similarity.ivfPqTopK(idxF, e, q5, "vec_id", "embedding",
          k = 10, nprobe = np, refine = 8, filterIds = Some(fids),
          nprobeMax = npMax)
        .select("q_id", "c_id")
      print(s"[probe] q141 filtered ivfpq k=10 $label: ")
      recall(annF, exactF, 10)
    }
    spark.stop()
  }
}
