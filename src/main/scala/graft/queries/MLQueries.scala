package graft.queries

import graft.Tables
import graft.operators.{MLOps, Rules}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** ML / mining operators on the testdata (SURVEY.md §2.10). RNG-bearing
  * ops are seeded and therefore deterministic for a fixed dataset, but
  * not cross-engine-checkable → rows-only driver check + golden/unit
  * specs on the reference CSV (see CarPipelineSpec). z-score and one-hot
  * are pure algebra → full DuckDB oracles.
  */
object MLQueries {

  private def emb(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables(s, d, "embeddings")
      .withColumn("f", transform(col("embedding"), _.cast("double")))
      .select((Seq(col("vec_id"), col("label")) ++
        (0 until 8).map(i => element_at(col("f"), i + 1).as(s"f$i"))): _*)

  val entries: Seq[(String, QueryDef)] = Seq(

    // ----------------------------------------------------------------
    // q50: FP-Growth rule mining (M12) over order-attribute baskets with
    // arules-style minlen filter. Deterministic (no RNG in FP-Growth).
    "q50_fpgrowth_rules" -> QueryDef(
      fn = (s, d) => {
        val o = Tables(s, d, "orders").join(broadcast(Tables(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        val tx = Rules.toTransactions(o, Seq("o_orderstatus", "o_orderpriority", "c_mktsegment"))
        Rules.mine(tx, "items", minSupport = 0.02, minConfidence = 0.3)
          .select(
            concat_ws(",", sort_array(col("antecedent"))).as("lhs"),
            concat_ws(",", sort_array(col("consequent"))).as("rhs"),
            round(col("confidence"), 6).as("confidence"),
            round(col("lift"), 6).as("lift"),
            round(col("support"), 6).as("support"),
            col("count"))
          .orderBy("lhs", "rhs")
      },
      oracle = None),

    // ----------------------------------------------------------------
    // q51: redundant-rule pruning (M13): drop any rule whose consequent
    // has a proper-subset antecedent with >= confidence.
    "q51_rule_prune" -> QueryDef(
      fn = (s, d) => {
        val o = Tables(s, d, "orders").join(broadcast(Tables(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        val tx = Rules.toTransactions(o, Seq("o_orderstatus", "o_orderpriority", "c_mktsegment"))
        val rules = Rules.mine(tx, "items", minSupport = 0.02, minConfidence = 0.3)
        Rules.pruneRedundant(rules)
          .select(
            concat_ws(",", sort_array(col("antecedent"))).as("lhs"),
            concat_ws(",", sort_array(col("consequent"))).as("rhs"),
            round(col("confidence"), 6).as("confidence"))
          .orderBy("lhs", "rhs")
      },
      oracle = None),

    // ----------------------------------------------------------------
    // q52: rule interest measures (T6): coverage, leverage, conviction,
    // cosine, chi-squared, odds-ratio from itemset supports.
    "q52_rule_measures" -> QueryDef(
      fn = (s, d) => {
        val o = Tables(s, d, "orders").join(broadcast(Tables(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        val tx = Rules.toTransactions(o, Seq("o_orderstatus", "o_orderpriority", "c_mktsegment"))
          .cache()
        val n = tx.count()
        val rules = Rules.mine(tx, "items", minSupport = 0.02, minConfidence = 0.3)
        val its = Rules.freqItemsets(tx, "items", minSupport = 0.02)
        Rules.withMeasures(rules, its, n)
          .select(
            concat_ws(",", sort_array(col("antecedent"))).as("lhs"),
            concat_ws(",", sort_array(col("consequent"))).as("rhs"),
            round(col("coverage"), 6).as("coverage"),
            round(col("leverage"), 6).as("leverage"),
            round(col("cosine"), 6).as("cosine"),
            round(col("chi_squared"), 4).as("chi_squared"))
          .orderBy("lhs", "rhs")
      },
      oracle = None),

    // ----------------------------------------------------------------
    // q53: k-means (M9/M10) on the first 8 embedding dims — cluster size
    // distribution (sizes sorted, id-free: stable under label permutation).
    "q53_kmeans_sizes" -> QueryDef(
      fn = (s, d) => {
        val (assigned, cost) = MLOps.kmeans(emb(s, d), (0 until 8).map(i => s"f$i"), k = 5)
        val sizes = assigned.groupBy("cluster").agg(count(lit(1)).as("size"))
          .select(col("size")).withColumn("rk",
            row_number().over(Window.orderBy(desc("size"))))
        sizes.select(col("rk").cast("int").as("rk"), col("size")).orderBy("rk")
      },
      oracle = None),

    // ----------------------------------------------------------------
    // q54: elbow sweep (M9): WSS for k=2..6 over one cached frame.
    "q54_kmeans_elbow" -> QueryDef(
      fn = (s, d) =>
        MLOps.elbow(emb(s, d), (0 until 8).map(i => s"f$i"), 2 to 6)
          .select(col("k"), round(col("wss"), 2).as("wss")).orderBy("k"),
      oracle = None),

    // ----------------------------------------------------------------
    // q55: PCA (M11) explained-variance ratios on 8 embedding dims.
    "q55_pca_variance" -> QueryDef(
      fn = (s, d) => {
        val spark = s
        import spark.implicits._
        MLOps.pcaExplainedVariance(emb(s, d), (0 until 8).map(i => s"f$i"), k = 4)
          .zipWithIndex.map { case (v, i) => (i + 1, math.rint(v * 1e6) / 1e6) }
          .toDF("component", "var_ratio").orderBy("component")
      },
      oracle = None),

    // ----------------------------------------------------------------
    // q56: OLS with full coefficient summary (M3: lm() analog, exact
    // normal-equation solve — no RNG at all).
    "q56_ols_coefficients" -> QueryDef(
      fn = (s, d) =>
        MLOps.ols(Tables(s, d, "lineitem"),
          Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice")
          .select(col("term"), round(col("estimate"), 4).as("estimate"),
            round(col("t_value"), 2).as("t_value"))
          .orderBy("term"),
      oracle = None),

    // ----------------------------------------------------------------
    // q57: random-forest feature importances (M6), seeded.
    "q57_rf_importance" -> QueryDef(
      fn = (s, d) =>
        MLOps.randomForestImportances(Tables(s, d, "orders"),
          Seq("o_custkey", "o_totalprice"), "o_orderkey", numTrees = 20)
          .select(col("feature"), round(col("importance"), 4).as("importance"))
          .orderBy("feature"),
      oracle = None),

    // ----------------------------------------------------------------
    // q58: z-score standardization (A12) — pure algebra, fully oracled.
    "q58_zscore" -> QueryDef(
      fn = (s, d) => {
        val o = Tables(s, d, "orders")
        val stats = o.agg(avg("o_totalprice").as("m"),
          stddev_samp(col("o_totalprice")).as("sd"))
        o.crossJoin(stats)
          .select(col("o_orderkey"),
            round((col("o_totalprice") - col("m")) / col("sd"), 4).as("z"))
          .orderBy("o_orderkey")
      },
      oracle = Some("""
        WITH s AS (SELECT AVG(o_totalprice) AS m, stddev_samp(o_totalprice) AS sd FROM orders)
        SELECT o_orderkey, ROUND((o_totalprice - m) / sd, 4) AS z
        FROM orders CROSS JOIN s ORDER BY o_orderkey""")),

    // ----------------------------------------------------------------
    // q59: full-rank one-hot encoding (M1) with R level ordering — pure
    // algebra, oracled via CASE sums.
    "q59_onehot" -> QueryDef(
      fn = (s, d) => {
        val o = Tables(s, d, "orders")
        val enc = MLOps.oneHotFullRank(o, "o_orderpriority")
        val dummyCols = MLOps.rLevels(o, "o_orderpriority").drop(1)
        enc.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt"),
            dummyCols.map(v => sum(col(s"`o_orderpriority.$v`")).as(
              "n_" + v.toLowerCase.replaceAll("[^a-z0-9]+", "_"))): _*)
          .orderBy("o_orderstatus")
      },
      oracle = Some("""
        SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n_2_high,
               CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS n_3_medium,
               CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS n_4_not_specified,
               CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n_5_low
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ----------------------------------------------------------------
    // q60: stratified 80/20 split on outcome quartiles (M2), seeded —
    // per-stratum train counts.
    "q60_stratified_split" -> QueryDef(
      fn = (s, d) => {
        val o = Tables(s, d, "orders")
        val (train, test) = MLOps.stratifiedSplit(o, "o_orderkey", "o_totalprice", 0.8)
        val tr = train.agg(count(lit(1)).as("n_train"))
        val te = test.agg(count(lit(1)).as("n_test"))
        tr.crossJoin(te).withColumn("n_total", col("n_train") + col("n_test"))
      },
      oracle = None),

    // ----------------------------------------------------------------
    // q61: Gaussian naive Bayes (M7) — predicted-class distribution.
    "q61_gaussian_nb" -> QueryDef(
      fn = (s, d) => {
        val ev = Tables(s, d, "events")
          .withColumn("label", (col("event_id") % 3).cast("double"))
        MLOps.naiveBayesGaussian(ev, Seq("value", "user_id"), "label")
          .groupBy(col("prediction"))
          .agg(count(lit(1)).as("cnt"))
          .select(col("prediction").cast("int").as("pred_class"), col("cnt"))
          .orderBy("pred_class")
      },
      oracle = None),

    // ----------------------------------------------------------------
    // q64: sketch aggregations — the 100-TB scale path for distinct
    // counts and quantiles (HLL++ / KLL-style approx vs exact deltas).
    // Approx values are engine-specific → rows-only check; the exact
    // columns double as internal validation.
    "q64_approx_sketch" -> QueryDef(
      fn = (s, d) =>
        Tables(s, d, "lineitem").groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("exact_parts"),
            approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
            round(expr("percentile(l_extendedprice, 0.9)"), 2).as("exact_p90"),
            round(expr("approx_percentile(l_extendedprice, 0.9, 10000)"), 2).as("approx_p90"))
          .orderBy("l_returnflag"),
      oracle = None),

    // ----------------------------------------------------------------
    // q65: salted skew join — result must equal the plain broadcast join
    // while fanning each hot key across 8 salt buckets (Skew.saltedJoin).
    "q65_salted_join" -> QueryDef(
      fn = (s, d) => {
        val li = Tables(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_linenumber"), col("l_quantity"))
        val supp = Tables(s, d, "supplier")
          .select(col("s_suppkey").as("l_suppkey"), col("s_name"), col("s_nationkey"))
        graft.operators.Skew.saltedJoin(li, supp, "l_suppkey",
            concat(col("l_orderkey"), lit("_"), col("l_linenumber")))
          .groupBy("s_name")
          .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
          .orderBy("s_name")
      },
      oracle = Some("""
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS cnt, SUM(l_quantity) AS sum_qty
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_name ORDER BY s_name""")),

    // ----------------------------------------------------------------
    // q63: rule-subset filters (F5 arrays_overlap on consequent, F6
    // partial item match via exists, F7 confidence threshold) + W3
    // argmax-by-lift per consequent — the arules subset()/%pin% surface.
    "q63_rule_subset" -> QueryDef(
      fn = (s, d) => {
        val o = Tables(s, d, "orders").join(broadcast(Tables(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        val tx = Rules.toTransactions(o, Seq("o_orderstatus", "o_orderpriority", "c_mktsegment"))
        val rules = Rules.mine(tx, "items", minSupport = 0.02, minConfidence = 0.3)
        val filtered = rules
          .filter(arrays_overlap(col("consequent"),
            array(lit("o_orderstatus=F"), lit("o_orderstatus=O"))) ||
            exists(col("antecedent"), _.contains("mktsegment")))
          .filter(col("confidence") > 0.3)
        val w = Window.partitionBy(concat_ws(",", sort_array(col("consequent"))))
          .orderBy(desc("lift"), concat_ws(",", sort_array(col("antecedent"))).asc)
        filtered.withColumn("rn", row_number().over(w))
          .select(
            concat_ws(",", sort_array(col("antecedent"))).as("lhs"),
            concat_ws(",", sort_array(col("consequent"))).as("rhs"),
            round(col("confidence"), 6).as("confidence"),
            round(col("lift"), 6).as("lift"),
            (col("rn") === 1).as("is_top_for_rhs"))
          .orderBy("rhs", "lhs")
      },
      oracle = None),

    // ----------------------------------------------------------------
    // q62: RBF-SVR stand-in (M8): random Fourier features + linear model
    // with a TrainValidationSplit grid (caret::tune analog); fit metrics.
    "q62_rff_svr" -> QueryDef(
      fn = (s, d) => {
        val spark = s
        import spark.implicits._
        val li = Tables(s, d, "lineitem").filter(col("l_orderkey") < 2000)
        val pred = MLOps.rffRegression(li, Seq("l_quantity", "l_discount"), "l_extendedprice",
          numFeatures = 16)
        val (rmse, r2, mae) = MLOps.regressionMetrics(pred, "prediction", "l_extendedprice")
        Seq((math.rint(rmse), math.rint(r2 * 1000) / 1000, math.rint(mae)))
          .toDF("rmse", "r2", "mae")
      },
      oracle = None)
  )
}
