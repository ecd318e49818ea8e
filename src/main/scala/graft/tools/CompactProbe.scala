package graft.tools

import graft.Tables
import graft.operators.{Dedup, Similarity, Tombstones}
import org.apache.spark.sql.functions._

/** Dev probe: the tombstone → compact → re-serve lifecycle in numbers —
  * the round-10 measurement VERDICT-r9 asked for (the compaction cost
  * was "right shape, asserted cost" until this).
  *
  * Usage: runMain graft.tools.CompactProbe <sfDir> [deadMod]
  *
  * MinHash leg (corpus = documents, shard = id-shifted every-40th doc):
  *   save      persist the corpus family (amortized, once per corpus)
  *   inc+tomb  per-batch incremental mining THROUGH the tombstoned load
  *             (every `deadMod`-th doc deleted) — the steady-state batch
  *             cost while deletions are logical
  *   compact   compactMinhash — the physical fold (two disk-to-disk
  *             rewrites per table, tombstones cleared)
  *   inc-post  the same batch mining from the compacted tables —
  *             asserted row-identical to the logical-delete run
  * IVF-PQ leg (vectors = embeddings, 50 query vectors, the q110 config):
  *   save / serve+tomb / compact / serve-post, same contract (post-
  *   compact serving asserted row-identical; dead ids asserted absent
  *   in both serving runs).
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val deadMod = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = Tables.session(32)
    import org.apache.hadoop.fs.Path
    val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("cp_mh_bands", "cp_mh_shingles", "cp_mh_meta", "cp_mh_tombstones",
        "cp_mh_bands__compact", "cp_mh_shingles__compact",
        "cp_pq_codes", "cp_pq_meta", "cp_pq_tombstones",
        "cp_pq_codes__compact").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new Path(wh, t)
      if (fs.exists(p)) fs.delete(p, true)
    }

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[compact] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def sameSet(a: org.apache.spark.sql.DataFrame,
                b: org.apache.spark.sql.DataFrame): Unit =
      require(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        "post-compact output diverged from the logical-delete output")

    // ---- MinHash family -------------------------------------------
    val corpus = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val shard = corpus.filter(pmod(col("doc_id"), lit(40)) === 0)
      .withColumn("doc_id", col("doc_id") + 100000000L)
    println(s"[compact] corpus=${corpus.count()} shard=${shard.count()} deadMod=$deadMod ($dir)")
    // warmup: signature kernel + band explode codegen
    Dedup.minhashIndex(corpus.limit(2000), "doc_id", "text").bands.count()
    time("mh save (amortized, once per corpus)") {
      Dedup.saveMinhashIndex(Dedup.minhashIndex(corpus, "doc_id", "text"), "cp_mh")
    }
    val sIdx = time("mh shard index") {
      val i = Dedup.minhashIndex(shard, "doc_id", "text"); i.bands.count(); i
    }
    time("mh tombstone add") {
      Tombstones.add(corpus.filter(pmod(col("doc_id"), lit(deadMod)) === 0)
        .select("doc_id"), "doc_id", "cp_mh")
    }
    val logical = time("mh inc+tomb (per-batch, logical deletes)") {
      val p = Dedup.minhashLshPairsIncremental(sIdx,
          Dedup.loadMinhashIndex(spark, "cp_mh"), threshold = 0.8)
        .select("a_id", "b_id", "jaccard").localCheckpoint(true)
      val dead = p.filter(
        (col("a_id") < 100000000L && pmod(col("a_id"), lit(deadMod)) === 0) ||
        (col("b_id") < 100000000L && pmod(col("b_id"), lit(deadMod)) === 0)).count()
      require(dead == 0, s"tombstoned corpus ids leaked into $dead pairs")
      println(s"[compact]   -> ${p.count()} pairs, 0 dead")
      p
    }
    time("mh compact (physical fold, tombstones cleared)") {
      Tombstones.compactMinhash(spark, "cp_mh")
    }
    time("mh inc-post (same batch from compacted tables)") {
      val p = Dedup.minhashLshPairsIncremental(sIdx,
          Dedup.loadMinhashIndex(spark, "cp_mh"), threshold = 0.8)
        .select("a_id", "b_id", "jaccard").localCheckpoint(true)
      sameSet(p, logical)
      println(s"[compact]   -> ${p.count()} pairs, identical")
    }

    // ---- IVF-PQ family (q110 config) ------------------------------
    val vecs = Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val queries = vecs.filter(col("vec_id") < 50)
    time("pq save (build + persist, amortized)") {
      Similarity.savePqIndex(Similarity.pqIndex(vecs, "vec_id", "embedding",
        nlist = 4096, m = 16, ksub = 32, seed = 42L), "cp_pq")
    }
    time("pq tombstone add") {
      Tombstones.add(vecs.filter(pmod(col("vec_id"), lit(deadMod)) === 0)
        .select("vec_id"), "vec_id", "cp_pq")
    }
    val served = time("pq serve+tomb (50 queries, logical deletes)") {
      val r = Similarity.ivfPqTopK(Similarity.loadPqIndex(spark, "cp_pq"),
          vecs, queries, "vec_id", "embedding", k = 10, nprobe = 1536,
          refine = 8).localCheckpoint(true)
      require(r.filter(pmod(col("c_id"), lit(deadMod)) === 0).count() == 0,
        "tombstoned vectors leaked into the served top-k")
      println(s"[compact]   -> ${r.count()} result rows, 0 dead")
      r
    }
    time("pq compact (physical fold, tombstones cleared)") {
      Tombstones.compactPq(spark, "cp_pq")
    }
    time("pq serve-post (same queries from compacted codes)") {
      val r = Similarity.ivfPqTopK(Similarity.loadPqIndex(spark, "cp_pq"),
          vecs, queries, "vec_id", "embedding", k = 10, nprobe = 1536,
          refine = 8).localCheckpoint(true)
      sameSet(r, served)
      println(s"[compact]   -> ${r.count()} result rows, identical")
    }
    require(!spark.catalog.tableExists("cp_mh_tombstones") &&
      !spark.catalog.tableExists("cp_pq_tombstones"))
    spark.stop()
  }
}
