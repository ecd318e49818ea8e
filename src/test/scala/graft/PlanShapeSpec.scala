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
