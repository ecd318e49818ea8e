package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape pins for the properties that matter at 100 TB:
  * filter pushdown and column pruning at the parquet scan, broadcast
  * joins on dimension tables, equi-join (not cross) candidate generation
  * in the LSH path, and no stray cartesian products. Asserted on the
  * FINAL adaptive plan (after an action — pre-execution AQE plans hide
  * codegen/join choices). */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = Tables.session(4)
  val dir = "/root/testdata/sf0.001"

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    // formatted mode prints PushedFilters/ReadSchema untruncated (the
    // default tree string elides long attribute lists with "...")
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q03: filter and projection are pushed into the parquet scan") {
    val p = finalPlan("q03_filter_project")
    assert("PushedFilters: \\[[^\\]]*[A-Za-z]".r.findFirstIn(p).isDefined,
      s"no non-empty PushedFilters in:\n${p.take(1200)}")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1))
    assert(read.isDefined && read.get.split(",").length <= 8,
      s"scan reads too many columns: $read")
    assert(!p.contains("CartesianProduct"))
  }

  test("q11: star join broadcasts the dimension sides") {
    val p = finalPlan("q11_star_join_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("q44: LSH candidate generation is an equi-join on (table, bucket)") {
    val p = finalPlan("q44_ann_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "LSH degenerated into a cross join")
  }

  test("q22: time-window aggregation is hash-aggregated, not sorted per group") {
    val p = finalPlan("q22_time_window")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"), p.take(1200))
  }

  test("q56: sufficient-stats OLS is a single narrow aggregation pass") {
    val p = finalPlan("q56_ols_coefficients")
    // one scan feeding one (partial+final) aggregate; no joins of the fact table
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(1200))
  }

  test("q71: curation pipeline stays join-free (one window + filters)") {
    val p = finalPlan("q71_corpus_curation")
    assert(!p.contains("Join"), "curation plan grew a join:\n" + p.take(1200))
    assert(p.contains("Window"), p.take(1200))
  }

  test("q85: benchmark gram set is broadcast; corpus side never shuffles pre-join") {
    val p = finalPlan("q85_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "decontamination degenerated into a shuffle join:\n" + p.take(1200))
  }

  test("q88/q91: quantization and classifier inference are shuffle-free projections") {
    // the operator-level claim (before any presentation orderBy): model
    // inference and quantization must never introduce an Exchange
    import org.apache.spark.sql.functions.col
    for ((name, df) <- Seq(
        "quantizeInt8" -> graft.operators.Similarity.quantizeInt8(
          Tables(spark, dir, "embeddings"), "vec_id", "embedding"),
        "hashedLinearScore" -> graft.operators.TextAnalysis.hashedLinearScore(
          Tables(spark, dir, "documents"), "doc_id", "text"))) {
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"$name grew a shuffle:\n" + p.take(1200))
    }
  }

  test("q87/q90: packing and pooling shuffle exactly once (the group key)") {
    import org.apache.spark.sql.functions.{col, expr, size, split}
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("tok"))
    // AQE plan strings print the final AND initial plans — count
    // exchanges in the final section only
    def finalSection(s: String): String = s.split("== Initial Plan ==")(0)
    val packed = graft.operators.Packing.packGreedy(toks, "doc_id", "tok", 512, 64)
    packed.collect()
    val p1 = finalSection(packed.queryExecution.executedPlan.toString)
    assert("Exchange".r.findAllIn(p1).length == 1,
      "packGreedy must shuffle exactly once (segment key):\n" + p1.take(1200))
    val pooled = graft.operators.Similarity.meanPoolNormalize(
      Tables(spark, dir, "embeddings")
        .select(expr("vec_id DIV 4").as("g"), col("embedding")), "g", "embedding")
    pooled.collect()
    val p2 = finalSection(pooled.queryExecution.executedPlan.toString)
    assert("Exchange".r.findAllIn(p2).length == 1,
      "meanPoolNormalize must shuffle exactly once (group key):\n" + p2.take(1200))
  }

  test("q94/q96: sampling windows are bucket-partitioned, never single-partition") {
    // the scale property: negativeSample's rank/lead window and
    // shardAssign's ord window must parallelize by bucket/shard — a
    // global (unpartitioned) window would show an Exchange
    // SinglePartition, the one shape that cannot survive 100 TB
    for (name <- Seq("q94_negative_sample", "q96_shard_assign")) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // the final presentation orderBy is a rangepartitioning exchange;
      // SinglePartition must not appear anywhere
      assert(!p.contains("Exchange SinglePartition"),
        s"$name grew a single-partition exchange:\n" + p.take(1500))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name degenerated into a cross join:\n" + p.take(1500))
    }
  }

  test("q95: flatten gate is broadcast-threshold + filter, no corpus shuffle") {
    import org.apache.spark.sql.functions.col
    // operator-level (before the presentation orderBy): the corpus leg
    // must see ONLY a broadcast join + codegen filter — the count
    // aggregate runs once against the checkpointed tiny frame, never
    // re-scanning or re-shuffling the corpus in the output plan
    val grouped = Tables(spark, dir, "documents")
      .select(col("doc_id"), org.apache.spark.sql.functions
        .substring(col("source"), 4, 1).as("g"))
    val kept = graft.operators.Sampling.inverseSqrtFlatten(grouped, "g", "doc_id")
    kept.collect()
    val p = kept.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    // no hash/range repartition anywhere (a SinglePartition exchange
    // over the checkpointed ~key-cardinality counts frame is fine — it
    // feeds the global min of a tiny Scan ExistingRDD, not the corpus)
    assert("Exchange (hash|range)partitioning".r.findFirstIn(p).isEmpty,
      "inverseSqrtFlatten shuffled the corpus:\n" + p.take(1500))
    assert("FileScan".r.findAllIn(p).length == 1,
      "corpus scanned more than once:\n" + p.take(1500))
  }

  test("q37: langId evaluates each stopword HOF once (no when-branch re-expansion)") {
    // the round-2 regression: the argmax when-chain inlined every score
    // expression into every branch — ~20 interpreted `filter` HOFs per
    // row instead of 4. withLangId stages scores as real columns;
    // CollapseProject must NOT re-fuse them into the consumers. Guard by
    // counting lambda-filter occurrences in the optimized plan.
    val df = SparkEntry.queries("q37_langid")(spark, dir)
    val optimized = df.queryExecution.optimizedPlan.toString
    val hofCount = "\\bfilter\\(".r.findAllIn(optimized).length
    assert(hofCount <= TextAnalysis.langStopwords.length,
      s"langId HOF re-expansion regressed: $hofCount filter() nodes in\n" +
        optimized.take(1500))
  }
}
