package graft

import graft.operators.{Sessionize, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sessionization equivalence (manual lag/cumsum vs native
  * session_window) and IVF ANN recall vs the exact baseline. */
class SessionIvfSpec extends AnyFunSuite {
  lazy val spark = Tables.session(4)
  val dir = "/root/testdata/sf0.001"

  test("manual sessions == session_window partitioning (count and bounds)") {
    val gapNs = 1800000000000L
    val events = Tables.events(spark, dir)
    val manual = Sessionize.manualSessions(events, "user_id", "ts", "event_id", gapNs)
      .groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("n_events"), min("ts").as("s_ns"), max("ts").as("e_ns"))
    val native = Sessionize.gapSessions(events, "user_id", "ts_ts", "30 minutes")
    // same number of sessions per user
    val m = manual.groupBy("user_id").count().withColumnRenamed("count", "m")
    val n = native.groupBy("user_id").count().withColumnRenamed("count", "n")
    val diff = m.join(n, "user_id").filter(col("m") =!= col("n")).count()
    assert(diff == 0, "session counts diverge between manual and session_window")
    // same event partitioning: total events in sessions match
    assert(manual.agg(sum("n_events")).head().getLong(0) ==
      native.agg(sum("n_events")).head().getLong(0))
    // session starts agree (ns -> micros truncation)
    val mStarts = manual.select(expr("s_ns div 1000").as("us")).orderBy("us")
      .collect().map(_.getLong(0))
    val nStarts = native.select(unix_micros(col("sess_start")).as("us")).orderBy("us")
      .collect().map(_.getLong(0))
    assert(mStarts.sameElements(nStarts))
  }

  test("IVF ANN: structural top-k and reasonable recall vs exact") {
    val e = Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding")
      .collect()
    // 10 hits per query, rank-ordered
    assert(ivf.length == 50)
    val byQ = ivf.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val cos = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    val ivfPairs = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivfPairs.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.2, s"IVF recall $recall unreasonably low")
    // determinism
    val again = Similarity.ivfTopK(e, q, "vec_id", "embedding").collect()
    assert(ivf.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("IVF-PQ: exhaustive probe + full refine == brute force exactly; ADC params recall floor") {
    val e = Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
    val n = e.count().toInt
    val idx = Similarity.pqIndex(e, "vec_id", "embedding")
    // compact scan side: one code row per non-zero vector, m codes in range
    val codeRows = idx.codes.collect()
    assert(codeRows.length == n) // no zero-norm vectors in this fixture
    codeRows.foreach { r =>
      val cs = r.getSeq[Int](2)
      assert(cs.length == idx.m && cs.forall(c => c >= 0 && c < idx.ksub))
    }
    // probing every cell with refine covering every candidate removes
    // both approximation legs: the ADC pre-rank cannot drop a true
    // neighbor and the refine re-score is exact, so the output must
    // equal brute force ROW FOR ROW
    val exhaustive = Similarity.ivfPqTopK(idx, e, q, "vec_id", "embedding",
        k = 10, nprobe = 16, refine = n)
      .orderBy("q_id", "rn").collect().map(_.toString)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 10)
      .orderBy("q_id", "rn").collect().map(_.toString)
    assert(exhaustive.sameElements(exact),
      "exhaustive IVF-PQ must reduce to the exact brute-force answer")
    // production params: ADC pre-rank + bounded refine — structural
    // top-k plus a recall floor vs exact
    val ann = Similarity.ivfPqTopK(idx, e, q, "vec_id", "embedding",
      k = 10, nprobe = 6, refine = 4).collect()
    assert(ann.length <= 50 && ann.nonEmpty)
    val annPairs = ann.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = exact.map(_.split(",")).map(a =>
      (a(0).drop(1).toLong, a(1).toLong)).toSet
    val recall = annPairs.intersect(exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.2, s"IVF-PQ recall $recall unreasonably low")
    // determinism: seeded coarse + codebook fits, seeded encode
    val again = Similarity.ivfPqTopK(idx, e, q, "vec_id", "embedding",
      k = 10, nprobe = 6, refine = 4).collect()
    assert(ann.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("attribute-filtered IVF-PQ: predicate pre-filters the code scan; survivor floor widens probes; exhaustive == FILTERED brute force") {
    val e = Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
    val n = e.count().toInt
    val pred = pmod(col("vec_id"), lit(4)) === 1
    val fids = e.filter(pred).select("vec_id")
    val idx = Similarity.pqIndex(e, "vec_id", "embedding")
    // exhaustive probing + full refine over the FILTERED candidates must
    // equal brute force over the filtered candidate set row for row
    val exhaustive = Similarity.ivfPqTopK(idx, e, q, "vec_id", "embedding",
        k = 10, nprobe = 16, refine = n, filterIds = Some(fids))
      .orderBy("q_id", "rn").collect().map(_.toString)
    val exact = Similarity.bruteForceTopK(e.filter(pred), q,
        "vec_id", "embedding", k = 10)
      .orderBy("q_id", "rn").collect()
    assert(exhaustive.nonEmpty)
    assert(exhaustive.sameElements(exact.map(_.toString)),
      "exhaustive filtered IVF-PQ must reduce to the filtered brute force")
    // production shape: a deliberately starved nprobe=1 — the survivor
    // floor must WIDEN the probe set; every result satisfies the
    // predicate; recall holds where the unwidened run starves
    val wide = Similarity.ivfPqTopK(idx, e, q, "vec_id", "embedding",
      k = 10, nprobe = 1, refine = 8, filterIds = Some(fids)).collect()
    assert(wide.nonEmpty && wide.forall(_.getLong(1) % 4 == 1),
      "filtered serving leaked a candidate outside the predicate")
    val exactPairs = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
        .intersect(exactPairs).size.toDouble / exactPairs.size
    val rWide = recall(wide)
    // nprobeMax == nprobe disables the widening: the starved baseline
    val narrow = Similarity.ivfPqTopK(idx, e, q, "vec_id", "embedding",
      k = 10, nprobe = 1, refine = 8, filterIds = Some(fids),
      nprobeMax = 1).collect()
    val rNarrow = recall(narrow)
    assert(rWide >= rNarrow,
      s"widening must never lose recall: wide=$rWide narrow=$rNarrow")
    assert(rWide >= 0.5, s"widened filtered recall too low: $rWide " +
      s"(narrow baseline $rNarrow)")
    // unfiltered call sites are untouched: filterIds=None keeps the
    // q107-era defaults (covered by the exhaustive test above)
  }

  test("IVF-PQ multi-assignment: exhaustive probe still == brute force (deduped); recall lifts at fixed probed fraction; save/load/encode carry assign") {
    val e = Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 20)
    val n = e.count().toInt
    val single = Similarity.pqIndex(e, "vec_id", "embedding",
      nlist = 16, m = 16, ksub = 32, seed = 42L)
    val multi = Similarity.pqIndex(e, "vec_id", "embedding",
      nlist = 16, m = 16, ksub = 32, seed = 42L, assign = 2)
    // each vector owns exactly `assign` code rows, in DISTINCT cells
    assert(multi.codes.count() == 2L * n)
    assert(multi.codes.groupBy("c_id").agg(countDistinct("cell").as("nc"))
      .filter(col("nc") =!= 2).count() == 0,
      "the two assigned cells of a vector must be distinct")
    // rank-0 copies == the single-assignment index exactly
    val rank0 = multi.codes.intersect(single.codes)
    assert(rank0.count() == n,
      "rank-0 copies must reproduce the single-assignment codes")
    // exhaustive probe + full refine still reduces to brute force: the
    // duplicate candidates dedup at their best ADC before the exact cut
    val exhaustive = Similarity.ivfPqTopK(multi, e, q, "vec_id", "embedding",
        k = 10, nprobe = 16, refine = n)
      .orderBy("q_id", "rn").collect().map(_.toString)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 10)
      .orderBy("q_id", "rn").collect().map(_.toString)
    assert(exhaustive.sameElements(exact),
      "exhaustive multi-assigned IVF-PQ must reduce to brute force")
    // the lift claim at production params: same probed cell fraction,
    // strictly more true neighbors reachable
    def recallOf(idx: Similarity.PqIndex): Double = {
      val ann = Similarity.ivfPqTopK(idx, e, q, "vec_id", "embedding",
        k = 10, nprobe = 6, refine = 8)
        .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ex = exact.map(_.split(",")).map(a => (a(0).drop(1).toLong, a(1).toLong)).toSet
      ann.intersect(ex).size.toDouble / ex.size
    }
    val r1 = recallOf(single)
    val r2 = recallOf(multi)
    assert(r2 > r1, s"multi-assignment must lift recall: single=$r1 multi=$r2")
    assert(r2 >= 0.8, s"assign=2 recall floor: $r2")
    // persistence + incremental encode carry the assignment factor
    try {
      Similarity.savePqIndex(multi, "ivf_ma", buckets = 8)
      val loaded = Similarity.loadPqIndex(spark, "ivf_ma")
      assert(loaded.assign == 2)
      val shard = e.limit(10).withColumn("vec_id", col("vec_id") + 5000000L)
      val enc = Similarity.encodePq(shard, "embedding", loaded)
      assert(enc.count() == 20, "encodePq must replicate per the frozen assign")
      // the serving answer through the loaded index matches the in-memory one
      val a1 = Similarity.ivfPqTopK(multi, e, q, "vec_id", "embedding",
        k = 10, nprobe = 6, refine = 8).collect().map(_.toString).sorted
      val a2 = Similarity.ivfPqTopK(loaded, e, q, "vec_id", "embedding",
        k = 10, nprobe = 6, refine = 8).collect().map(_.toString).sorted
      assert(a1.sameElements(a2))
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_ma_codes")
      spark.sql("DROP TABLE IF EXISTS ivf_ma_meta")
      graft.operators.Fence.forceRelease(spark, "ivf_ma")
    }
    // hygiene: assign on a two-level coarse refuses loudly
    val err = intercept[IllegalArgumentException] {
      Similarity.pqIndex(e, "vec_id", "embedding",
        nlist = 4096, m = 16, ksub = 32, seed = 42L, assign = 2)
    }
    assert(err.getMessage.contains("single-level"), err.getMessage)
  }

  test("PqLut == composed slice-dot LUT bit for bit; short-vector edge; codegen == interpreted") {
    import graft.functions.VectorExpressions
    val m = 4; val ksub = 3; val dsub = 16
    val rng = new java.util.Random(7L)
    val books = Array.fill(m, ksub, dsub)(rng.nextGaussian() * 0.1)
    val e = Tables(spark, dir, "embeddings").limit(100)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    // a vector SHORTER than m*dsub exercises the slice+dot tail rule
    // (sum over the elements that exist)
    val short = spark.range(1).select(lit(-1L).as("vec_id"),
      array((0 until 10).map(i => lit(i * 0.25 - 1.0)): _*).as("v"))
    val in = e.unionByName(short)
    val composed = in.withColumn("lut", flatten(array((0 until m).map { j =>
      array(books(j).map(c =>
        VectorExpressions.dot(slice(col("v"), j * dsub + 1, dsub),
          typedLit(c.toSeq))): _*)
    }: _*)))
    val native = in.withColumn("lut", VectorExpressions.pqLut(col("v"), books))
    def rows(df: org.apache.spark.sql.DataFrame): Array[(Long, Seq[Double])] =
      df.orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](2)))
    val a = rows(composed); val b = rows(native)
    assert(a.length == b.length && a.zip(b).forall { case ((i1, l1), (i2, l2)) =>
      i1 == i2 && l1.length == m * ksub &&
        l1.zip(l2).forall { case (x, y) => x == y } // bit-exact, no tolerance
    }, "native PqLut diverges from the composed slice-dot LUT")
    // interpreted eval path (nullSafeEval) == codegen path
    val cg = spark.conf.getOption("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = rows(in.withColumn("lut",
        VectorExpressions.pqLut(col("v"), books)))
      assert(interp.zip(b).forall { case ((_, l1), (_, l2)) =>
        l1.zip(l2).forall { case (x, y) => x == y } })
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", cg.getOrElse("true"))
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    }
  }

  test("two-level coarse quantizer: nlist 4096 from one bounded sample, exhaustive probe == brute force") {
    val e = Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
    val n = e.count().toInt
    // 4096 cells was structurally impossible for the single-level
    // trainer (k bounded by the sample); the round-9 trainer factors it
    // into two bounded Lloyd fits
    val idx = Similarity.pqIndex(e, "vec_id", "embedding", nlist = 4096)
    assert(idx.coarse.n1 == 64 && idx.coarse.n2 == 64 && idx.coarse.nlist == 4096)
    // every vector encodes into a legal hierarchical cell
    val cs = idx.codes.agg(min("cell"), max("cell"), count(lit(1))).head()
    assert(cs.getInt(0) >= 0 && cs.getInt(1) < 4096 && cs.getLong(2) == n)
    // probing every cell (the beam covers all n1 supers when
    // nprobe = nlist) with full refine removes both approximation legs:
    // the output must equal brute force ROW FOR ROW — the two-stage
    // probe provably reaches every cell
    val exhaustive = Similarity.ivfPqTopK(idx, e, q, "vec_id", "embedding",
        k = 10, nprobe = 4096, refine = n)
      .orderBy("q_id", "rn").collect().map(_.toString)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 10)
      .orderBy("q_id", "rn").collect().map(_.toString)
    assert(exhaustive.sameElements(exact),
      "exhaustive two-level IVF-PQ must reduce to the exact brute-force answer")
    // bounded beam probe: structural output + recall floor + determinism
    val ann = Similarity.ivfPqTopK(idx, e, q, "vec_id", "embedding",
      k = 10, nprobe = 64, refine = 8).collect()
    assert(ann.nonEmpty && ann.length <= 50)
    val exactPairs = exact.map(_.split(",")).map(a =>
      (a(0).drop(1).toLong, a(1).toLong)).toSet
    val recall = ann.map(r => (r.getLong(0), r.getLong(1))).toSet
      .intersect(exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.2, s"two-level IVF-PQ recall $recall unreasonably low")
    val again = Similarity.ivfPqTopK(idx, e, q, "vec_id", "embedding",
      k = 10, nprobe = 64, refine = 8).collect()
    assert(ann.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("semanticDedup auto-nlist: a budget the old 512-cap trainer breaches now resolves via two-level cells") {
    // sf0.1's 2000 vectors: in ANY 512-cell clustering the within-cell
    // pair mass is >= 512*ceil(avg)*floor... >= ~2900 by convexity, so
    // a 500-pair budget must refuse at the old cap — reproduced here
    // with an explicit nlist=512
    val e01 = Tables(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val boom = intercept[IllegalArgumentException](
      Similarity.semanticDedup(e01, "vec_id", "embedding", threshold = 0.95,
        nlist = 512, maxPairs = 500L))
    assert(boom.getMessage.contains("pair mass"))
    // auto-nlist (budget-coupled) asks for k = 2n²/maxPairs = 16000
    // cells; the two-level trainer delivers them and the guard passes
    val out = Similarity.semanticDedup(e01, "vec_id", "embedding",
      threshold = 0.95, maxPairs = 500L).cache()
    val n = e01.count()
    assert(out.count() == n, "every nonzero-norm doc must get a row")
    // structural invariants hold in the hierarchical cell space
    assert(out.filter(col("kept") && col("canonical") =!= col("vec_id")).count() == 0)
    assert(out.filter(!col("kept")).filter(col("canonical") >= col("vec_id")).count() == 0)
    assert(out.agg(min("cell"), max("cell")).head() match {
      case r => r.getInt(0) >= 0 && r.getInt(1) < 16002
    })
    out.unpersist()
  }

  test("semanticDedup: exact clones collapse to one survivor; invariants; budget guard") {
    val base = Tables(spark, dir, "embeddings").select("vec_id", "embedding")
    val corpus = base.union(base.withColumn("vec_id", col("vec_id") + 10000000L))
    // near-exact threshold: only clone groups merge, so kept == the
    // number of DISTINCT embeddings (identical vectors always share a
    // cell; clone cosine rounds to exactly 1.0)
    val out = Similarity.semanticDedup(corpus, "vec_id", "embedding",
      threshold = 0.999999).cache()
    val distinctVecs = corpus.select("embedding").distinct().count()
    assert(out.count() == corpus.count(), "every nonzero-norm doc must get a row")
    assert(out.filter(col("kept")).count() == distinctVecs,
      "kept survivors must be one per distinct embedding at the exact-merge threshold")
    // canonical is the min id of its group and kept rows self-point
    assert(out.filter(col("kept") && col("canonical") =!= col("vec_id")).count() == 0)
    assert(out.filter(!col("kept")).filter(col("canonical") >= col("vec_id")).count() == 0,
      "canonical must be the min id of the component")
    // dropped docs' canonical is kept, in the same cell
    val kept = out.filter(col("kept"))
      .select(col("vec_id").as("canonical"), col("cell").as("__kc"))
    assert(out.filter(!col("kept")).join(kept, Seq("canonical"), "left")
      .filter(col("__kc").isNull || col("__kc") =!= col("cell")).count() == 0)
    // determinism
    val again = Similarity.semanticDedup(corpus, "vec_id", "embedding",
      threshold = 0.999999)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
    // budget guard: a degenerate clustering refuses loudly
    val e = intercept[IllegalArgumentException](
      Similarity.semanticDedup(corpus, "vec_id", "embedding",
        threshold = 0.9, nlist = 1, maxPairs = 10L))
    assert(e.getMessage.contains("pair mass"))
    // branch identity: forcing the exact-dup collapse (pairs-per-doc 0)
    // must reproduce the direct branch row for row — this corpus's
    // pairs-of-twins mass (0.5/doc) takes the direct branch by default
    val collapsed = Similarity.semanticDedup(corpus, "vec_id", "embedding",
      threshold = 0.999999, collapsePairsPerDoc = 0.0)
    assert(out.exceptAll(collapsed).count() == 0 &&
      collapsed.exceptAll(out).count() == 0,
      "collapse branch diverges from the direct branch")
  }

  test("lshDupPairs == exact cosineDupPairs on the dup-bearing corpus (recall 1.0)") {
    // the q45 shape: id-shifted copy creates exact-duplicate pairs, which
    // collide in every sign-LSH table by construction; the bucketed plan
    // must reproduce the exact all-pairs answer row for row
    val base = Tables(spark, dir, "embeddings").select("vec_id", "embedding")
    val shifted = base.withColumn("vec_id", col("vec_id") + 10000000L)
    val corpus = base.union(shifted).cache()
    val exact = Similarity.cosineDupPairs(corpus, "vec_id", "embedding", 0.9)
      .orderBy("a_id", "b_id").collect().map(_.toString)
    // force the collapse branch: this 50%-duplicate corpus sits below
    // the default pairs-per-doc threshold (pairs-of-twins = 0.5/doc),
    // and the rep-election + expansion machinery is what needs pinning
    val bucketed = Similarity.lshDupPairs(corpus, "vec_id", "embedding", 0.9,
        collapsePairsPerDoc = 0.0)
      .orderBy("a_id", "b_id").collect().map(_.toString)
    assert(exact.nonEmpty, "corpus must contain duplicate pairs")
    assert(bucketed.sameElements(exact),
      s"bucketed plan diverges: exact=${exact.length} bucketed=${bucketed.length}")
    // conditional-collapse parity: the forced-lean branch (bands every
    // copy) must reproduce the forced-collapse branch row for row on
    // this 50%-duplicate corpus
    val lean = Similarity.lshDupPairs(corpus, "vec_id", "embedding", 0.9,
        collapsePairsPerDoc = Double.PositiveInfinity)
      .orderBy("a_id", "b_id").collect().map(_.toString)
    assert(lean.sameElements(exact),
      s"lean branch diverges: exact=${exact.length} lean=${lean.length}")
    corpus.unpersist()
  }

  // shared fixture for the incremental embedding-index tests: corpus ids
  // < 10M; shard = id-shifted copies of every 5th vector (each has an
  // identical corpus twin) plus nothing else — the q102 shape
  private lazy val embCorpus =
    Tables(spark, dir, "embeddings").select("vec_id", "embedding")
  private lazy val embShard = embCorpus.filter(col("vec_id") % 5 === 0)
    .withColumn("vec_id", col("vec_id") + 10000000L)

  test("incremental sign-LSH == full lshDupPairs restricted to shard-touching pairs") {
    val cIdx = Similarity.embedIndex(embCorpus, "vec_id", "embedding", dim = 64)
    val sIdx = Similarity.embedIndex(embShard, "vec_id", "embedding", dim = 64)
    val inc = Similarity.lshDupPairsIncremental(sIdx, cIdx, threshold = 0.9)
      .orderBy("a_id", "b_id").collect()
    val full = Similarity.lshDupPairs(embCorpus.union(embShard), "vec_id", "embedding",
        threshold = 0.9, dim = 64)
      .filter(col("a_id") >= 10000000L || col("b_id") >= 10000000L)
      .orderBy("a_id", "b_id").collect()
    assert(inc.nonEmpty, "shard twins must produce cross pairs")
    assert(inc.map(_.toString).sameElements(full.map(_.toString)),
      s"incremental diverges from full: inc=${inc.length} full=${full.length}")
    // every shard vector's corpus twin is found at cos exactly 1.0
    val twins = inc.filter(r => r.getLong(1) - r.getLong(0) == 10000000L)
    assert(twins.length == embShard.count() &&
      twins.forall(_.getDouble(2) == 1.0))
    // no corpus-internal pairs leak in
    assert(inc.forall(r => r.getLong(0) >= 10000000L || r.getLong(1) >= 10000000L))
    // hash-family mismatch refuses loudly (tables / seed / dim are the family)
    val other = Similarity.embedIndex(embShard, "vec_id", "embedding",
      numTables = 4, dim = 64)
    intercept[IllegalArgumentException](
      Similarity.lshDupPairsIncremental(other, cIdx, threshold = 0.9))
    intercept[IllegalArgumentException](cIdx.union(other))
  }

  test("EmbedIndex.union folds a shard in; gate == incremental cross leg, once per pair") {
    val cIdx = Similarity.embedIndex(embCorpus, "vec_id", "embedding", dim = 64)
    val sIdx = Similarity.embedIndex(embShard, "vec_id", "embedding", dim = 64)
    import spark.implicits._
    // batch-2 ingestion against the folded corpus: a copy of vector 5
    // (5 % 5 == 0, so its twin exists in BOTH generations) and a fresh
    // vector unrelated to the corpus
    val batch2 = embCorpus.filter(col("vec_id") === 5)
      .withColumn("vec_id", lit(20000005L))
      .union(Seq((20000007L, Array.fill(64)(0.123f)))
        .toDF("vec_id", "embedding"))
    val folded = cIdx.union(sIdx)
    val b2Idx = Similarity.embedIndex(batch2, "vec_id", "embedding", dim = 64)
    val inc2 = Similarity.lshDupPairsIncremental(b2Idx, folded, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // 20000005 matches its corpus twin (5) and its shard twin (10000000+5)
    assert(inc2.contains((5L, 20000005L, 1.0)))
    assert(inc2.contains((10000005L, 20000005L, 1.0)))
    // the incremental output == full run over all three generations,
    // restricted to batch-2-touching pairs
    val full2 = Similarity.lshDupPairs(
        embCorpus.union(embShard).union(batch2), "vec_id", "embedding",
        threshold = 0.9, dim = 64)
      .filter(col("a_id") >= 20000000L || col("b_id") >= 20000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc2 == full2)
    // the stateless gate equals the incremental run's cross leg,
    // exactly one row per (shard, corpus) pair despite multi-table
    // collisions; a zero-norm shard vector must be dropped (withNorm
    // contract), not crash the ANSI rescore or band to the all-ones key
    val gateShard = embShard.union(
      Seq((30000001L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding"))
    val gate = Similarity.lshDupMatchCorpus(gateShard, "vec_id", "embedding",
        cIdx, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(!gate.exists(_._1 == 30000001L), "zero-norm vector leaked through gate")
    assert(gate.length == gate.map(r => (r._1, r._2)).distinct.length,
      "gate emitted a pair more than once")
    val cross = Similarity.lshDupPairsIncremental(sIdx, cIdx, threshold = 0.9)
      .filter(col("a_id") < 10000000L && col("b_id") >= 10000000L)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    assert(gate.toSet == cross)
  }

  test("lshDupPairs collapse edge cases: clone families > 2, zero vectors, cross-family fanout") {
    import spark.implicits._
    // hand-built corpus exercising exactly what the exact-dup collapse
    // must preserve:
    //  - ids 1..5: a 5-member clone family (within-group expansion must
    //    emit all C(5,2)=10 pairs at cos 1.0, not just rep pairs)
    //  - ids 11..13 vs 21..22: two DISTINCT near-dup families (cos just
    //    under 1.0) — cross-group expansion must fan 3x2=6 member pairs
    //    out of ONE representative pair
    //  - ids 31..32: two all-zero vectors — cosine is undefined for
    //    them, and before the shared zero-norm exclusion the ANSI 0/0
    //    rescore threw DIVIDE_BY_ZERO mid-join (this test found that);
    //    the contract is they drop out of the cosine universe entirely,
    //    in BOTH tiers
    //  - id 41: a singleton unique vector (no pairs)
    val vA = Array.fill(64)(1.0f)
    val vB = Array.tabulate(64)(i => if (i == 0) 1.2f else 1.0f) // cos ~0.9995 vs vA
    val vZ = Array.fill(64)(0.0f)
    val vU = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val rows = (1L to 5L).map(i => (i, vA)) ++
      (11L to 13L).map(i => (i, vA)) ++ (21L to 22L).map(i => (i, vB)) ++
      (31L to 32L).map(i => (i, vZ)) ++ Seq((41L, vU))
    // note ids 1..5 and 11..13 share vA: ONE 8-member family — also
    // checks that group identity is the vector, not id adjacency
    val corpus = rows.toDF("vec_id", "embedding")
    val exact = Similarity.cosineDupPairs(corpus, "vec_id", "embedding", 0.9)
      .orderBy("a_id", "b_id").collect().map(_.toString)
    val bucketed = Similarity.lshDupPairs(corpus, "vec_id", "embedding",
        0.9, dim = 64)
      .orderBy("a_id", "b_id").collect().map(_.toString)
    assert(bucketed.sameElements(exact),
      s"collapse diverges on edge corpus: exact=${exact.mkString(",")} bucketed=${bucketed.mkString(",")}")
    // structure: C(8,2)=28 within the 8-member vA family, 8x2=16 cross
    // to the 2-member vB family, 1 within vB; the zero-vector pair and
    // the singleton contribute nothing
    assert(exact.length == 28 + 16 + 1)
    val ids = Similarity.cosineDupPairs(corpus, "vec_id", "embedding", 0.9)
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(!ids.exists(Set(31L, 32L, 41L)),
      "zero-norm or singleton ids leaked into the pair set")
  }

  test("LSH ANN: candidate pruning with reasonable recall vs exact") {
    val e = Tables(spark, dir, "embeddings").cache()
    val exact = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(e, "vec_id", "embedding", k = 5).collect()
    val lshPairs = lsh.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = lshPairs.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.4, s"LSH recall $recall unreasonably low")
    // determinism (seeded hyperplanes)
    val again = Similarity.lshTopK(e, "vec_id", "embedding", k = 5).collect()
    assert(lsh.map(_.toString).sameElements(again.map(_.toString)))
    e.unpersist()
  }
}
