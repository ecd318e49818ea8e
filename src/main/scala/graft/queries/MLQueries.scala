package graft.queries

import graft.Tables
import graft.operators.{MLOps, Rules}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** ML / mining operators on the testdata (SURVEY.md §2.10). Seeded
  * RNG-bearing fits (k-means, PCA, RF, RFF-SVR) are deterministic per
  * dataset but not cross-engine-checkable → rows-only driver check +
  * golden/unit specs (CarPipelineSpec, MLOpsSpec). Everything reducible
  * to exact sufficient statistics or co-occurrence counts carries a full
  * DuckDB oracle: z-score, one-hot, hash-stratified split, Gaussian NB,
  * sufficient-stats OLS, FP-Growth rule queries (SQL-enumerated),
  * sketch bounds.
  */
object MLQueries {

  /** Shared by q69 (per-segment loop) and q82 (segment-encoded single
    * fit): DuckDB enumeration of the per-segment rules on 2-item baskets —
    * per-segment n and minCount, conf = pc/ac raw division, support as
    * exact integer fixed-point. */
  private val perSegmentRulesOracle = """
        WITH t AS (
          SELECT c_mktsegment AS seg,
                 'o_orderstatus=' || o_orderstatus AS i1,
                 'o_orderpriority=' || o_orderpriority AS i2
          FROM orders JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        nn AS (SELECT seg, COUNT(*) AS n, CEIL(CAST(0.05 AS DOUBLE) * COUNT(*)) AS minc
               FROM t GROUP BY seg),
        s1 AS (SELECT seg, item, COUNT(*) AS c FROM (
                 SELECT seg, i1 AS item FROM t UNION ALL SELECT seg, i2 AS item FROM t) u
               GROUP BY seg, item),
        p AS (SELECT seg, i1 AS a, i2 AS b, COUNT(*) AS c FROM t GROUP BY seg, i1, i2),
        r1 AS (
          SELECT p.seg, p.a AS lhs, p.b AS rhs, p.c AS pc, sa.c AS ac
          FROM p JOIN s1 sa ON sa.seg = p.seg AND sa.item = p.a
                 JOIN nn ON nn.seg = p.seg
          WHERE p.c >= nn.minc
          UNION ALL
          SELECT p.seg, p.b AS lhs, p.a AS rhs, p.c AS pc, sb.c AS ac
          FROM p JOIN s1 sb ON sb.seg = p.seg AND sb.item = p.b
                 JOIN nn ON nn.seg = p.seg
          WHERE p.c >= nn.minc)
        SELECT r1.seg AS segment, lhs, rhs,
               CAST(pc AS DOUBLE) / ac AS confidence,
               (pc * 1000000 // nn.n) / 1e6 AS support
        FROM r1 JOIN nn ON nn.seg = r1.seg
        WHERE CAST(pc AS DOUBLE) / ac >= CAST(0.25 AS DOUBLE)
        ORDER BY segment, lhs, rhs"""

  private def emb(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables(s, d, "embeddings")
      .withColumn("f", transform(col("embedding"), _.cast("double")))
      .select((Seq(col("vec_id"), col("label")) ++
        (0 until 8).map(i => element_at(col("f"), i + 1).as(s"f$i"))): _*)

  /** Shared rule-mining base: orders ⋈ customer → 3-item baskets. */
  private def ruleBase(s: org.apache.spark.sql.SparkSession, d: String) = {
    val o = Tables(s, d, "orders").join(broadcast(Tables(s, d, "customer")),
      col("o_custkey") === col("c_custkey"))
    Rules.toTransactions(o, Seq("o_orderstatus", "o_orderpriority", "c_mktsegment"))
  }

  /** DuckDB enumeration of exactly the rule set FP-Growth produces on the
    * 3-attribute baskets: itemset supports are plain co-occurrence counts
    * (singles / pairs / triples), frequent iff count >= ceil(minsup*n)
    * (FPGrowth's minCount, double math mirrored), rules are all
    * single-consequent decompositions with conf = pc/ac >= minconf.
    * Confidence is emitted raw (single int division → bit-identical);
    * lift/support as exact integer fixed-point (floor at 1e-6) so no
    * cross-engine double drift is possible. Item prefixes sort lexically
    * c_mktsegment < o_orderpriority < o_orderstatus, so sorted-pair lhs
    * strings are hardcoded in that order. */
  private val rulesOracleBase = """
    WITH t AS (
      SELECT 'o_orderstatus=' || o_orderstatus AS i1,
             'o_orderpriority=' || o_orderpriority AS i2,
             'c_mktsegment=' || c_mktsegment AS i3
      FROM orders JOIN customer ON o_custkey = c_custkey),
    nn AS (SELECT COUNT(*) AS n, CEIL(CAST(0.02 AS DOUBLE) * COUNT(*)) AS minc FROM t),
    s1 AS (SELECT item, COUNT(*) AS c FROM (
             SELECT i1 AS item FROM t UNION ALL SELECT i2 AS item FROM t
             UNION ALL SELECT i3 AS item FROM t) u GROUP BY item),
    p AS (SELECT a, b, COUNT(*) AS c FROM (
            SELECT i1 AS a, i2 AS b FROM t
            UNION ALL SELECT i1 AS a, i3 AS b FROM t
            UNION ALL SELECT i2 AS a, i3 AS b FROM t) u GROUP BY a, b),
    tri AS (SELECT i1, i2, i3, COUNT(*) AS c FROM t GROUP BY i1, i2, i3),
    r1 AS (
      SELECT p.a AS lhs, p.b AS rhs, p.c AS pc, sa.c AS ac, sb.c AS cc
      FROM p JOIN s1 sa ON sa.item = p.a JOIN s1 sb ON sb.item = p.b CROSS JOIN nn
      WHERE p.c >= nn.minc
      UNION ALL
      SELECT p.b AS lhs, p.a AS rhs, p.c AS pc, sb.c AS ac, sa.c AS cc
      FROM p JOIN s1 sa ON sa.item = p.a JOIN s1 sb ON sb.item = p.b CROSS JOIN nn
      WHERE p.c >= nn.minc),
    r2 AS (
      SELECT t3.i2 || ',' || t3.i1 AS lhs, t3.i3 AS rhs, t3.c AS pc, pp.c AS ac, ss.c AS cc
      FROM tri t3 JOIN p pp ON pp.a = t3.i1 AND pp.b = t3.i2
           JOIN s1 ss ON ss.item = t3.i3 CROSS JOIN nn
      WHERE t3.c >= nn.minc
      UNION ALL
      SELECT t3.i3 || ',' || t3.i1 AS lhs, t3.i2 AS rhs, t3.c AS pc, pp.c AS ac, ss.c AS cc
      FROM tri t3 JOIN p pp ON pp.a = t3.i1 AND pp.b = t3.i3
           JOIN s1 ss ON ss.item = t3.i2 CROSS JOIN nn
      WHERE t3.c >= nn.minc
      UNION ALL
      SELECT t3.i3 || ',' || t3.i2 AS lhs, t3.i1 AS rhs, t3.c AS pc, pp.c AS ac, ss.c AS cc
      FROM tri t3 JOIN p pp ON pp.a = t3.i2 AND pp.b = t3.i3
           JOIN s1 ss ON ss.item = t3.i1 CROSS JOIN nn
      WHERE t3.c >= nn.minc),
    allr AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2),
    fr AS (SELECT allr.*, nn.n FROM allr CROSS JOIN nn
           WHERE CAST(pc AS DOUBLE) / ac >= CAST(0.3 AS DOUBLE))"""

  lazy val entries: Seq[(String, QueryDef)] = base ++ q105 ++ q106

  private val base: Seq[(String, QueryDef)] = Seq(

    // ----------------------------------------------------------------
    // q50: FP-Growth rule mining (M12) over order-attribute baskets with
    // arules-style minlen filter. Deterministic (no RNG in FP-Growth) and
    // fully oracled: the 3-item baskets make the mined rule set SQL-
    // enumerable from co-occurrence counts (see rulesOracleBase).
    "q50_fpgrowth_rules" -> QueryDef(
      fn = (s, d) => {
        val tx = ruleBase(s, d).cache()
        val n = tx.count()
        val rules = Rules.mine(tx, "items", minSupport = 0.02, minConfidence = 0.3,
          nTransactions = n)
        Rules.withCountBasis(rules, n)
          .select(
            concat_ws(",", sort_array(col("antecedent"))).as("lhs"),
            concat_ws(",", sort_array(col("consequent"))).as("rhs"),
            col("confidence"),
            expr(s"((__pc * ${n}L) * 1000000L div (__ac * __cc)) / 1e6").as("lift"),
            expr(s"(__pc * 1000000L div ${n}L) / 1e6").as("support"),
            col("count"))
          .orderBy("lhs", "rhs")
      },
      oracle = Some(rulesOracleBase + """
        SELECT lhs, rhs, CAST(pc AS DOUBLE) / ac AS confidence,
               ((pc * n) * 1000000 // (ac * cc)) / 1e6 AS lift,
               (pc * 1000000 // n) / 1e6 AS support,
               CAST(pc AS BIGINT) AS count
        FROM fr ORDER BY lhs, rhs""")),

    // ----------------------------------------------------------------
    // q51: redundant-rule pruning (M13): drop any rule whose consequent
    // has a proper-subset antecedent with >= confidence. Oracled: with
    // single-consequent rules of lhs size <= 2, the only proper subsets
    // are the single-item sub-rules (item strings contain no commas, so
    // LIKE on the sorted concat is an exact component test).
    "q51_rule_prune" -> QueryDef(
      fn = (s, d) => {
        val tx = ruleBase(s, d)
        val rules = Rules.mine(tx, "items", minSupport = 0.02, minConfidence = 0.3)
        Rules.pruneRedundant(rules)
          .select(
            concat_ws(",", sort_array(col("antecedent"))).as("lhs"),
            concat_ws(",", sort_array(col("consequent"))).as("rhs"),
            col("confidence"))
          .orderBy("lhs", "rhs")
      },
      oracle = Some(rulesOracleBase + """
        SELECT f.lhs, f.rhs, CAST(f.pc AS DOUBLE) / f.ac AS confidence
        FROM fr f
        WHERE NOT EXISTS (
          SELECT 1 FROM fr g
          WHERE g.rhs = f.rhs AND strpos(g.lhs, ',') = 0
            AND (f.lhs LIKE g.lhs || ',%' OR f.lhs LIKE '%,' || g.lhs)
            AND CAST(g.pc AS DOUBLE) / g.ac >= CAST(f.pc AS DOUBLE) / f.ac)
        ORDER BY f.lhs, f.rhs""")),

    // ----------------------------------------------------------------
    // q52: rule interest measures (T6): coverage, leverage, cosine,
    // chi-squared. Computed from the recovered integer count basis with a
    // fixed op tree mirrored verbatim in the oracle → bit-identical
    // doubles, no rounding needed (and no second FPGrowth fit: the
    // antecedent/consequent supports come from withCountBasis, not a
    // freqItemsets join — this also cut the query's runtime ~5x).
    "q52_rule_measures" -> QueryDef(
      fn = (s, d) => {
        val tx = ruleBase(s, d).cache()
        val n = tx.count()
        val rules = Rules.mine(tx, "items", minSupport = 0.02, minConfidence = 0.3,
          nTransactions = n)
        Rules.withCountBasis(rules, n)
          .withColumn("__s", expr(s"CAST(__pc AS DOUBLE) / ${n}L"))
          .withColumn("__sa", expr(s"CAST(__ac AS DOUBLE) / ${n}L"))
          .withColumn("__sb", expr(s"CAST(__cc AS DOUBLE) / ${n}L"))
          .select(
            concat_ws(",", sort_array(col("antecedent"))).as("lhs"),
            concat_ws(",", sort_array(col("consequent"))).as("rhs"),
            col("__sa").as("coverage"),
            expr("__s - (__sa * __sb)").as("leverage"),
            expr("__s / sqrt(__sa * __sb)").as("cosine"),
            expr(s"(CAST(${n}L AS DOUBLE) * ((__s - (__sa * __sb)) * (__s - (__sa * __sb)))) / " +
              "(((__sa * __sb) * (1.0 - __sa)) * (1.0 - __sb))").as("chi_squared"))
          .orderBy("lhs", "rhs")
      },
      oracle = Some(rulesOracleBase + """,
        m AS (SELECT lhs, rhs,
                CAST(pc AS DOUBLE) / n AS s,
                CAST(ac AS DOUBLE) / n AS sa,
                CAST(cc AS DOUBLE) / n AS sb, n
              FROM fr)
        SELECT lhs, rhs, sa AS coverage,
               s - (sa * sb) AS leverage,
               s / sqrt(sa * sb) AS cosine,
               (CAST(n AS DOUBLE) * ((s - (sa * sb)) * (s - (sa * sb)))) /
                 (((sa * sb) * (1.0 - sa)) * (1.0 - sb)) AS chi_squared
        FROM m ORDER BY lhs, rhs""")),

    // ----------------------------------------------------------------
    // q53: k-means (M9/M10) on the first 8 embedding dims. The k=5 fit and
    // the per-cluster size aggregation both execute; the emitted columns
    // are the fit's ORACLE-CHECKABLE invariants (every point assigned to
    // one of exactly k non-empty clusters), so the query hash-verifies
    // cross-engine while the RNG-dependent size distribution itself stays
    // pinned in QueriesSpec/CarPhasesSpec.
    "q53_kmeans_sizes" -> QueryDef(
      fn = (s, d) => {
        val (assigned, _) = MLOps.kmeans(emb(s, d), (0 until 8).map(i => s"f$i"), k = 5)
        assigned.groupBy("cluster").agg(count(lit(1)).as("size"))
          .agg(count(lit(1)).cast("int").as("n_clusters"),
            sum("size").as("n_points"),
            (min("size") >= 1).as("all_nonempty"))
      },
      oracle = Some("""
        SELECT CAST(5 AS INTEGER) AS n_clusters,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               TRUE AS all_nonempty
        FROM embeddings""")),

    // ----------------------------------------------------------------
    // q54: elbow sweep (M9): WSS for k=1..6 over one cached standardized
    // frame. The sweep executes; the oracle pins the k=1 identity
    // WSS(1) = total SS about the mean = (n-1)*d on z-scores (the same
    // identity MLOps.elbow computes analytically because Spark KMeans
    // requires k >= 2) plus the bound 0 < WSS(k) <= WSS(1) for every
    // seeded fit. The RNG-dependent WSS(k>=2) values stay in QueriesSpec.
    "q54_kmeans_elbow" -> QueryDef(
      fn = (s, d) => {
        val wss = MLOps.elbow(emb(s, d), (0 until 8).map(i => s"f$i"), 1 to 6)
        wss.crossJoin(broadcast(
            wss.filter(col("k") === 1).select(col("wss").as("w1"))))
          .select(col("k").cast("int").as("k"),
            when(col("k") === 1, round(col("wss"), 4)).as("wss1_check"),
            (col("wss") > 0 && col("wss") <= col("w1") + 1e-6).as("sane"))
          .orderBy("k")
      },
      oracle = Some("""
        WITH n AS (SELECT COUNT(*) AS n FROM embeddings),
        ks AS (SELECT unnest(range(1, 7)) AS k)
        SELECT CAST(ks.k AS INTEGER) AS k,
               CASE WHEN ks.k = 1
                    THEN ROUND(CAST((n.n - 1) * 8 AS DOUBLE), 4) END AS wss1_check,
               TRUE AS sane
        FROM ks CROSS JOIN n ORDER BY k""")),

    // ----------------------------------------------------------------
    // q55: PCA (M11) on the 8 standardized embedding dims. Emits the
    // 8x8 (upper-triangle) covariance matrix of the 1e-4-quantized raw
    // features as EXACT integers (m = n*S_ij - S_i*S_j over quantized
    // longs — no division, so bit-identical cross-engine; correlations,
    // the matrix the standardized PCA diagonalizes, are recoverable as
    // m_ij/sqrt(m_ii*m_jj)), plus a sentinel row (-1,-1) proving the PCA
    // fit ran and its k=8 explained-variance ratios sum to exactly 1.
    // The single collect() is one row of sufficient statistics (45
    // longs) — the sanctioned driver round-trip.
    "q55_pca_variance" -> QueryDef(
      fn = (s, d) => {
        val spark = s
        import spark.implicits._
        val e = emb(s, d)
        val q = e.select((0 until 8).map(i =>
          expr(s"CAST(round(f$i * 10000) AS BIGINT)").as(s"q$i")): _*)
        val sumCols = (0 until 8).map(i => sum(col(s"q$i")).as(s"s$i"))
        val prodCols = for { i <- 0 until 8; j <- i until 8 }
          yield sum(col(s"q$i") * col(s"q$j")).as(s"p${i}_$j")
        val st = q.agg(count(lit(1)).as("n"), (sumCols ++ prodCols): _*).head()
        val n = st.getAs[Long]("n")
        val covRows = (for { i <- 0 until 8; j <- i until 8 } yield {
          val m = n * st.getAs[Long](s"p${i}_$j") -
            st.getAs[Long](s"s$i") * st.getAs[Long](s"s$j")
          (i, j, m)
        }).toSeq
        val ratios = MLOps.pcaExplainedVariance(e, (0 until 8).map(i => s"f$i"), k = 8)
        val sentinel = (-1, -1, math.rint(ratios.sum * 1e6).toLong)
        (sentinel +: covRows).toDF("i", "j", "m").orderBy("i", "j")
      },
      oracle = Some {
        val sums = (0 until 8).map(i => s"SUM(q[${i + 1}]) AS s$i")
        val prods = for { i <- 0 until 8; j <- i until 8 }
          yield s"SUM(q[${i + 1}] * q[${j + 1}]) AS p${i}_$j"
        val entries = for { i <- 0 until 8; j <- i until 8 }
          yield s"SELECT $i AS i, $j AS j, CAST(n * p${i}_$j - s$i * s$j AS BIGINT) AS m FROM st"
        s"""
        WITH e AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
                     x -> CAST(round(x * 10000) AS BIGINT)) AS q
                   FROM embeddings),
        st AS (SELECT COUNT(*) AS n, ${(sums ++ prods).mkString(", ")} FROM e)
        SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j, m FROM (
          SELECT -1 AS i, -1 AS j, CAST(1000000 AS BIGINT) AS m FROM st
          UNION ALL ${entries.mkString(" UNION ALL ")})
        ORDER BY i, j"""
      }),

    // ----------------------------------------------------------------
    // q56: OLS with coefficient t-values (M3: lm() analog) — single-pass
    // exact-sufficient-statistics + Cramer closed form (OlsSufficient):
    // one narrow aggregation instead of MLlib's assembler + iterative
    // passes, bit-identical to the generated DuckDB oracle. The MLlib
    // normal-solver path stays in MLOps.ols + specs.
    "q56_ols_coefficients" -> QueryDef(
      fn = (s, d) =>
        graft.operators.OlsSufficient.fit(Tables(s, d, "lineitem"),
          Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice"),
      oracle = Some(graft.operators.OlsSufficient.oracleSql("lineitem",
        Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice"))),

    // ----------------------------------------------------------------
    // q57: random-forest feature importances (M6), seeded. The 20-tree
    // fit executes; the emitted columns are its ORACLE-CHECKABLE
    // invariants (the q53/q54/q55 pattern): one row per feature,
    // importances non-negative and summing to exactly 1 (MLlib
    // normalizes). The RNG-dependent importance values stay spec-pinned.
    "q57_rf_importance" -> QueryDef(
      fn = (s, d) => {
        val imp = MLOps.randomForestImportances(Tables(s, d, "orders"),
          Seq("o_custkey", "o_totalprice"), "o_orderkey", numTrees = 20)
        imp.crossJoin(broadcast(imp.agg(
            sum("importance").as("__tot"), count(lit(1)).as("__nf"))))
          .select(col("feature"),
            (col("importance") >= 0).as("nonneg"),
            (abs(col("__tot") - 1.0) <= 1e-9).as("sums_to_one"),
            col("__nf").cast("int").as("n_features"))
          .orderBy("feature")
      },
      oracle = Some("""
        SELECT 'o_custkey' AS feature, TRUE AS nonneg, TRUE AS sums_to_one,
               CAST(2 AS INTEGER) AS n_features
        UNION ALL
        SELECT 'o_totalprice', TRUE, TRUE, CAST(2 AS INTEGER)
        ORDER BY feature""")),

    // ----------------------------------------------------------------
    // q58: z-score standardization (A12) — pure algebra, fully oracled.
    "q58_zscore" -> QueryDef(
      fn = (s, d) => {
        val o = Tables(s, d, "orders")
        val stats = o.agg(avg("o_totalprice").as("m"),
          stddev_samp(col("o_totalprice")).as("sd"))
        o.crossJoin(broadcast(stats))
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
    // q60: stratified 80/20 split on outcome quartiles (M2). Strata are
    // exact-percentile buckets; membership is a DETERMINISTIC multiplicative
    // hash of the key (Knuth 2654435761 mod 2^32) rather than RNG — the
    // split a 100-TB pipeline actually wants (reproducible, partition-
    // independent, no sampler state) and fully oracle-checkable. The
    // seeded sampleBy variant remains in MLOps.stratifiedSplit + specs.
    "q60_stratified_split" -> QueryDef(
      fn = (s, d) => {
        val o = Tables(s, d, "orders")
        val Array(b1, b2, b3) = o.select(
          expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))")).first()
          .getSeq[Double](0).toArray
        o.withColumn("stratum",
            when(col("o_totalprice") <= b1, 1).when(col("o_totalprice") <= b2, 2)
              .when(col("o_totalprice") <= b3, 3).otherwise(4))
          .withColumn("tr",
            when((col("o_orderkey") * lit(2654435761L)) % lit(4294967296L) < lit(3435973837L), 1L)
              .otherwise(0L))
          .groupBy("stratum")
          .agg(sum(col("tr")).as("n_train"),
            sum(lit(1L) - col("tr")).as("n_test"),
            count(lit(1)).as("n_total"))
          .withColumn("train_frac", expr("(n_train * 1000000L div n_total) / 1e6"))
          .orderBy("stratum")
      },
      oracle = Some("""
        WITH b AS (SELECT quantile_cont(o_totalprice, 0.25) AS b1,
                          quantile_cont(o_totalprice, 0.5) AS b2,
                          quantile_cont(o_totalprice, 0.75) AS b3 FROM orders),
        t AS (SELECT CASE WHEN o_totalprice <= b1 THEN 1 WHEN o_totalprice <= b2 THEN 2
                          WHEN o_totalprice <= b3 THEN 3 ELSE 4 END AS stratum,
                     CASE WHEN ((o_orderkey * 2654435761) % 4294967296) < 3435973837
                          THEN 1 ELSE 0 END AS tr
              FROM orders CROSS JOIN b)
        SELECT stratum, CAST(SUM(tr) AS BIGINT) AS n_train,
               CAST(SUM(1 - tr) AS BIGINT) AS n_test,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               ((SUM(tr) * 1000000) // COUNT(*)) / 1e6 AS train_frac
        FROM t GROUP BY stratum ORDER BY stratum""")),

    // ----------------------------------------------------------------
    // q61: Gaussian naive Bayes (M7) — predicted-class distribution,
    // rebuilt as pure DataFrame algebra so it is oracle-checkable AND
    // scale-shaped: one pass of conditional aggregation yields per-class
    // sufficient statistics (exact decimal/long sums → cross-engine-
    // deterministic means/variances), broadcast back as a 1-row frame;
    // scoring + argmax is a single codegen'd projection (no row
    // explosion, no window shuffle). The MLlib estimator path stays in
    // MLOps.naiveBayesGaussian + MLOpsSpec.
    "q61_gaussian_nb" -> QueryDef(
      fn = (s, d) => {
        val ev = Tables(s, d, "events")
          .withColumn("label", (col("event_id") % 3).cast("long"))
        // per-class sufficient stats, one row wide (k=0,1,2)
        val aggs = (0 until 3).flatMap { k =>
          Seq(
            sum(when(col("label") === k, 1L).otherwise(0L)).as(s"nk$k"),
            sum(when(col("label") === k, col("value").cast(DecimalType(18, 2)))).as(s"s1v$k"),
            sum(when(col("label") === k, (col("value") * col("value")).cast(DecimalType(22, 4)))).as(s"s2v$k"),
            sum(when(col("label") === k, col("user_id"))).as(s"s1u$k"),
            sum(when(col("label") === k, col("user_id") * col("user_id"))).as(s"s2u$k"))
        }
        val params = ev.agg(aggs.head, aggs.tail: _*)
        val derived = params.select((0 until 3).flatMap { k =>
          Seq(
            expr(s"CAST(nk$k AS DOUBLE)").as(s"nkd$k"),
            expr(s"CAST(s1v$k AS DOUBLE) / nk$k").as(s"mu_v$k"),
            expr(s"(CAST(s2v$k AS DOUBLE) - ((CAST(s1v$k AS DOUBLE) * CAST(s1v$k AS DOUBLE)) / nk$k)) / (nk$k - 1)").as(s"var_v$k"),
            expr(s"CAST(s1u$k AS DOUBLE) / nk$k").as(s"mu_u$k"),
            expr(s"(CAST(s2u$k AS DOUBLE) - ((CAST(s1u$k AS DOUBLE) * CAST(s1u$k AS DOUBLE)) / nk$k)) / (nk$k - 1)").as(s"var_u$k"),
            expr(s"CAST(nk$k AS DOUBLE)").as(s"w$k"))
        } :+ expr("CAST(nk0 + nk1 + nk2 AS DOUBLE)").as("ntot"): _*)
        def score(k: Int): String =
          s"(ln(nkd$k / ntot) - 0.5 * ln(6.283185307179586 * var_v$k)" +
            s" - (((value - mu_v$k) * (value - mu_v$k)) / (2.0 * var_v$k))" +
            s" - 0.5 * ln(6.283185307179586 * var_u$k)" +
            s" - (((user_id - mu_u$k) * (user_id - mu_u$k)) / (2.0 * var_u$k)))"
        ev.crossJoin(broadcast(derived))
          .withColumn("pred_class", expr(
            s"CASE WHEN ${score(0)} >= ${score(1)} AND ${score(0)} >= ${score(2)} THEN 0 " +
              s"WHEN ${score(1)} >= ${score(2)} THEN 1 ELSE 2 END"))
          .groupBy("pred_class").agg(count(lit(1)).as("cnt"))
          .select(col("pred_class").cast("int").as("pred_class"), col("cnt"))
          .orderBy("pred_class")
      },
      oracle = Some {
        def score(k: Int): String =
          s"(ln(nkd$k / ntot) - 0.5 * ln(6.283185307179586 * var_v$k)" +
            s" - (((value - mu_v$k) * (value - mu_v$k)) / (2.0 * var_v$k))" +
            s" - 0.5 * ln(6.283185307179586 * var_u$k)" +
            s" - (((user_id - mu_u$k) * (user_id - mu_u$k)) / (2.0 * var_u$k)))"
        val aggSql = (0 until 3).map { k =>
          s"""SUM(CASE WHEN label = $k THEN 1 ELSE 0 END) AS nk$k,
             SUM(CASE WHEN label = $k THEN CAST(value AS DECIMAL(18,2)) END) AS s1v$k,
             SUM(CASE WHEN label = $k THEN CAST(value * value AS DECIMAL(22,4)) END) AS s2v$k,
             SUM(CASE WHEN label = $k THEN user_id END) AS s1u$k,
             SUM(CASE WHEN label = $k THEN user_id * user_id END) AS s2u$k"""
        }.mkString(",\n")
        val derSql = (0 until 3).map { k =>
          s"""CAST(nk$k AS DOUBLE) AS nkd$k,
             CAST(s1v$k AS DOUBLE) / nk$k AS mu_v$k,
             (CAST(s2v$k AS DOUBLE) - ((CAST(s1v$k AS DOUBLE) * CAST(s1v$k AS DOUBLE)) / nk$k)) / (nk$k - 1) AS var_v$k,
             CAST(s1u$k AS DOUBLE) / nk$k AS mu_u$k,
             (CAST(s2u$k AS DOUBLE) - ((CAST(s1u$k AS DOUBLE) * CAST(s1u$k AS DOUBLE)) / nk$k)) / (nk$k - 1) AS var_u$k"""
        }.mkString(",\n")
        s"""
        WITH e AS (SELECT event_id, user_id, value, CAST(event_id % 3 AS BIGINT) AS label FROM events),
        g AS (SELECT $aggSql FROM e),
        p AS (SELECT $derSql, CAST(nk0 + nk1 + nk2 AS DOUBLE) AS ntot FROM g),
        sc AS (SELECT CASE WHEN ${score(0)} >= ${score(1)} AND ${score(0)} >= ${score(2)} THEN 0
                           WHEN ${score(1)} >= ${score(2)} THEN 1 ELSE 2 END AS pred_class
               FROM e CROSS JOIN p)
        SELECT CAST(pred_class AS INTEGER) AS pred_class, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM sc GROUP BY pred_class ORDER BY pred_class"""
      }),

    // ----------------------------------------------------------------
    // q64: sketch aggregations — the 100-TB scale path for distinct
    // counts and quantiles (HLL++ / KLL-style approx). Approx values are
    // engine-specific, so the query emits the exact values plus booleans
    // asserting the sketches landed within error bounds (rsd 0.02 sketch
    // vs 6% bound; approx_percentile vs 1% relative) — the oracle checks
    // the exact columns and that both bounds hold (literal TRUE).
    "q64_approx_sketch" -> QueryDef(
      fn = (s, d) =>
        Tables(s, d, "lineitem").groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("exact_parts"),
            approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
            expr("percentile(l_extendedprice, 0.9)").as("exact_p90"),
            expr("approx_percentile(l_extendedprice, 0.9, 10000)").as("approx_p90"))
          // scale 4, not 2: the p90 interpolation is a + (j/10)*(k/100)
          // — exactly 3 decimals — so a half-tie at scale 4 cannot occur,
          // while 0.9*0.05 = .045 ties at scale 2
          .select(col("l_returnflag"), col("exact_parts"),
            round(col("exact_p90"), 4).as("exact_p90"),
            (abs(col("approx_parts") - col("exact_parts")) <=
              col("exact_parts") * 0.06).as("parts_in_bounds"),
            (abs(col("approx_p90") - col("exact_p90")) <=
              col("exact_p90") * 0.01).as("p90_in_bounds"))
          .orderBy("l_returnflag"),
      oracle = Some("""
        SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
               ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS exact_p90,
               TRUE AS parts_in_bounds, TRUE AS p90_in_bounds
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

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
        val tx = ruleBase(s, d).cache()
        val n = tx.count()
        val rules = Rules.mine(tx, "items", minSupport = 0.02, minConfidence = 0.3,
          nTransactions = n)
        val based = Rules.withCountBasis(rules, n)
          .withColumn("__liftppm", expr(s"(__pc * ${n}L) * 1000000L div (__ac * __cc)"))
        val filtered = based
          .filter(arrays_overlap(col("consequent"),
            array(lit("o_orderstatus=F"), lit("o_orderstatus=O"))) ||
            exists(col("antecedent"), _.contains("mktsegment")))
          .filter(col("confidence") > 0.3)
        // argmax-by-lift per consequent, ordered on the exact fixed-point
        // lift so both engines rank identically even on near-ties.
        val w = Window.partitionBy(concat_ws(",", sort_array(col("consequent"))))
          .orderBy(desc("__liftppm"), concat_ws(",", sort_array(col("antecedent"))).asc)
        filtered.withColumn("rn", row_number().over(w))
          .select(
            concat_ws(",", sort_array(col("antecedent"))).as("lhs"),
            concat_ws(",", sort_array(col("consequent"))).as("rhs"),
            col("confidence"),
            expr("__liftppm / 1e6").as("lift"),
            (col("rn") === 1).as("is_top_for_rhs"))
          .orderBy("rhs", "lhs")
      },
      oracle = Some(rulesOracleBase + """,
        f AS (SELECT lhs, rhs, CAST(pc AS DOUBLE) / ac AS confidence,
                     (pc * n) * 1000000 // (ac * cc) AS liftppm
              FROM fr
              WHERE (rhs IN ('o_orderstatus=F', 'o_orderstatus=O') OR lhs LIKE '%mktsegment%')
                AND CAST(pc AS DOUBLE) / ac > CAST(0.3 AS DOUBLE)),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY rhs ORDER BY liftppm DESC, lhs) AS rn FROM f)
        SELECT lhs, rhs, confidence, liftppm / 1e6 AS lift, (rn = 1) AS is_top_for_rhs
        FROM r ORDER BY rhs, lhs""")),

    // ----------------------------------------------------------------
    // q69: per-segment rule re-mining (M14, associationRules.R:349-370):
    // filter to a segment, re-mine at segment-relative support. Two
    // pinned segments, 2-attribute baskets → the oracle enumerates
    // single/pair itemsets per segment with per-segment n and minCount.
    "q69_rules_by_segment" -> QueryDef(
      fn = (s, d) => {
        val segs = Seq("BUILDING", "MACHINERY")
        val o = Tables(s, d, "orders").join(broadcast(Tables(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
          .filter(col("c_mktsegment").isin(segs: _*))
        segs.map { g =>
          val tx = Rules.toTransactions(
            o.filter(col("c_mktsegment") === g),
            Seq("o_orderstatus", "o_orderpriority")).cache()
          val n = tx.count()
          Rules.withCountBasis(
              Rules.mine(tx, "items", minSupport = 0.05, minConfidence = 0.25,
                nTransactions = n), n)
            .select(lit(g).as("segment"),
              concat_ws(",", sort_array(col("antecedent"))).as("lhs"),
              concat_ws(",", sort_array(col("consequent"))).as("rhs"),
              col("confidence"),
              expr(s"(__pc * 1000000L div ${n}L) / 1e6").as("support"))
        }.reduce(_.unionByName(_)).orderBy("segment", "lhs", "rhs")
      },
      oracle = Some(perSegmentRulesOracle)),

    // ----------------------------------------------------------------
    // q82: SAME result as q69 through the SCALE path — one segment-encoded
    // FP-Growth fit over all segments (Rules.segmentEncodedMine) instead
    // of one fit per segment. Shares q69's oracle verbatim: the driver
    // hash-compares both to the same enumerated rule set, proving the
    // single-fit factorization end-to-end.
    "q82_rules_segment_onefit" -> QueryDef(
      fn = (s, d) => {
        val segs = Seq("BUILDING", "MACHINERY")
        val o = Tables(s, d, "orders").join(broadcast(Tables(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
          .filter(col("c_mktsegment").isin(segs: _*))
        val mined = Rules.segmentEncodedMine(o, "c_mktsegment",
          Seq("o_orderstatus", "o_orderpriority"),
          minSupport = 0.05, minConfidence = 0.25)
        val nDf = o.groupBy(col("c_mktsegment").as("segment"))
          .count().withColumnRenamed("count", "__n")
        mined.join(broadcast(nDf), "segment")
          .select(col("segment"),
            concat_ws(",", sort_array(col("antecedent"))).as("lhs"),
            concat_ws(",", sort_array(col("consequent"))).as("rhs"),
            col("confidence"),
            expr("(`count` * 1000000L div __n) / 1e6").as("support"))
          .orderBy("segment", "lhs", "rhs")
      },
      oracle = Some(perSegmentRulesOracle)),

    // ----------------------------------------------------------------
    // q62: RBF-SVR stand-in (M8): random Fourier features + linear model
    // with a TrainValidationSplit grid (caret::tune analog). The grid fit
    // and metric evaluation execute; the emitted columns are the fit's
    // ORACLE-CHECKABLE invariants (the q53/q54/q55 pattern): one
    // prediction per input row, grid-winner RMSE finite and positive,
    // caret R-squared in (0,1], MAE bounded by RMSE (Jensen). The
    // RNG-dependent metric values stay spec-pinned.
    "q62_rff_svr" -> QueryDef(
      fn = (s, d) => {
        val spark = s
        import spark.implicits._
        val li = Tables(s, d, "lineitem").filter(col("l_orderkey") < 2000)
        val pred = MLOps.rffRegression(li, Seq("l_quantity", "l_discount"), "l_extendedprice",
          numFeatures = 16).cache()
        val (rmse, r2, mae) = MLOps.regressionMetrics(pred, "prediction", "l_extendedprice")
        Seq((pred.count(),
            !rmse.isNaN && !rmse.isInfinite && rmse > 0,
            r2 > 0 && r2 <= 1.0,
            mae > 0 && mae <= rmse + 1e-9))
          .toDF("n_pred", "rmse_pos_finite", "r2_in_01", "mae_le_rmse")
      },
      oracle = Some("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pred, TRUE AS rmse_pos_finite,
               TRUE AS r2_in_01, TRUE AS mae_le_rmse
        FROM lineitem WHERE l_orderkey < 2000""")),

    // ----------------------------------------------------------------
    // q109: EXACT RBF ε-SVR (round 8 — closes the q62 RFF deviation for
    // M8, BigDataProject.R:370-376 e1071 defaults C=1/eps=0.1/
    // gamma=1/dim with z-scaled inputs). Driver-side SMO on a BOUNDED
    // id-ordered training prefix (SVR is O(n²) in the kernel by nature;
    // the reference trains on ~160 rows), scoring distributed as a
    // literal-SV codegen expression. The solver is certified by the
    // MATH: SVR's dual is a convex QP, so the emitted row pins
    //   n_pred        every slice row scored (count parity with DuckDB)
    //   kkt_ok        max KKT violation m(α)−M(α) ≤ 1e−6 (converged
    //                 optimum — a complete optimality proof, SvrSpec
    //                 adds the full residual + duality-gap certificate)
    //   sv_sparse     support vectors a strict subset of training rows
    //   rmse_pos_finite / mae_le_rmse  metric sanity on the unscaled
    //                 predictions (same legs as q62)
    "q109_svr_exact" -> QueryDef(
      fn = (s, d) => {
        val spark = s
        import spark.implicits._
        val li = Tables(s, d, "lineitem").filter(col("l_orderkey") < 2000)
          .withColumn("__ord", col("l_orderkey") * 16 + col("l_linenumber"))
        // e1071 scales features AND label; one stats pass, then scaled
        // columns feed the fit and predictions unscale back
        val st = li.agg(
          avg("l_quantity").as("mq"), stddev("l_quantity").as("sq"),
          avg("l_discount").as("md"), stddev("l_discount").as("sd"),
          avg("l_extendedprice").as("mp"), stddev("l_extendedprice").as("sp")).head()
        val (mq, sq, md, sd, mp, sp) = (st.getDouble(0), st.getDouble(1),
          st.getDouble(2), st.getDouble(3), st.getDouble(4), st.getDouble(5))
        val scaled = li
          .withColumn("zq", (col("l_quantity") - mq) / sq)
          .withColumn("zd", (col("l_discount") - md) / sd)
          .withColumn("zp", (col("l_extendedprice") - mp) / sp)
        val (model, pred0) = graft.operators.SvrSmo.fitPredict(
          scaled, Seq("zq", "zd"), "zp", "__ord", trainRows = 160)
        val pred = pred0
          .withColumn("prediction", col("prediction") * sp + mp).cache()
        val (rmse, _, mae) = MLOps.regressionMetrics(pred, "prediction", "l_extendedprice")
        val nPred = pred.count()
        pred.unpersist() // metrics + count taken; don't hold blocks across a 109-query sweep
        Seq((nPred,
            model.kktViolation <= 1e-6,
            model.svX.length > 0 && model.svX.length < model.nTrain,
            !rmse.isNaN && !rmse.isInfinite && rmse > 0,
            mae > 0 && mae <= rmse + 1e-9))
          .toDF("n_pred", "kkt_ok", "sv_sparse", "rmse_pos_finite", "mae_le_rmse")
      },
      oracle = Some("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pred, TRUE AS kkt_ok, TRUE AS sv_sparse,
               TRUE AS rmse_pos_finite, TRUE AS mae_le_rmse
        FROM lineitem WHERE l_orderkey < 2000""")),

    // ----------------------------------------------------------------
    // q100: decision-tree regression (M5, BigDataProject.R:329-330) +
    // model persistence (S4, :572 saveRDS) — the last two §2 operators
    // without a catalog row. The q57/q62 fit-invariant pattern: the
    // depth-5 tree fit and a save/load round-trip both EXECUTE; the
    // emitted columns are their oracle-checkable invariants —
    //   n_rows        every input row scored (count parity with DuckDB)
    //   depth_le_max  fitted depth within the requested bound
    //   binary_shape  numNodes odd (a proper binary tree has 2L-1 nodes)
    //   preds_in_range leaf predictions are label means → inside
    //                  [min(label), max(label)]
    //   reload_parity the RELOADED model's predictions are bit-identical
    //                  to the in-memory model's on every row (S4)
    // Structure values themselves (split order, thresholds) stay
    // spec-pinned in MLOpsSpec — MLlib's histogram binning makes them
    // engine-specific, like q57's importances.
    "q100_decision_tree" -> QueryDef(
      fn = (s, d) => {
        val li = Tables(s, d, "lineitem")
        val feats = Seq("l_quantity", "l_discount", "l_tax")
        val (model, assembled) = MLOps.decisionTreeFit(li, feats,
          "l_extendedprice", maxDepth = 5)
        val dir = java.nio.file.Files.createTempDirectory("q100_dt").toString + "/model"
        model.write.overwrite().save(dir)
        val reloaded = org.apache.spark.ml.regression.DecisionTreeRegressionModel.load(dir)
        // full-corpus scoring: every row gets a prediction, and leaf
        // means stay inside the label range
        val stats = model.transform(assembled).agg(
          count(lit(1)).as("n_rows"),
          min(col("prediction")).as("__pmin"), max(col("prediction")).as("__pmax"),
          min(col("l_extendedprice")).as("__lmin"),
          max(col("l_extendedprice")).as("__lmax"))
        // reload parity on the DISTINCT feature combinations — a tree's
        // prediction is a pure function of the feature vector, so this
        // covers every corpus row without needing a unique row key (the
        // synthetic lineitem has duplicate (orderkey, linenumber) pairs)
        val fc = MLOps.assemble(li.select(feats.map(col): _*).distinct(), feats)
        val par = model.transform(fc).select(feats.map(col) :+ col("prediction").as("p1"): _*)
          .join(reloaded.transform(fc)
            .select(feats.map(col) :+ col("prediction").as("p2"): _*), feats)
          .agg(max(abs(col("p1") - col("p2"))).as("__maxdiff"))
        stats.crossJoin(broadcast(par))
          .select(col("n_rows"),
            lit(model.depth <= 5).as("depth_le_max"),
            lit(model.numNodes % 2 == 1).as("binary_shape"),
            (col("__pmin") >= col("__lmin") && col("__pmax") <= col("__lmax"))
              .as("preds_in_range"),
            (col("__maxdiff") === 0.0).as("reload_parity"))
      },
      oracle = Some("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, TRUE AS depth_le_max,
               TRUE AS binary_shape, TRUE AS preds_in_range, TRUE AS reload_parity
        FROM lineitem"""))
  )

  // ------------------------------------------------------------------
  // q105: driver-side CENTER UNSCALE (C11, clustering.R:85-87) — the
  // last §2 operator without an oracle row. Runs the real pipeline
  // cluster() (z-scale → restart fits → H-W polish → renumber → the k×d
  // driver-side unscale center + z*scale), then pins the unscale by the
  // linearity identity it must satisfy: the size-weighted mean of the
  // UNSCALED centers equals the raw per-feature global mean (per-cluster
  // z-means unscale to per-cluster raw means; weighting by size
  // recovers the global mean). A wrong unscale — z*scale alone,
  // center*z+scale, swapped vectors — breaks the identity at the first
  // feature. q53's invariant recipe: data-derived numbers DuckDB
  // reproduces (n_points, the raw f0 mean) + a theorem boolean carrying
  // the fit-dependent check. The two collects are k sizes and one row
  // of 8 means — the sanctioned driver round-trip.
  private val q105: Seq[(String, QueryDef)] = Seq(
    "q105_center_unscale" -> QueryDef(
      fn = (s, d) => {
        val e = emb(s, d).select((0 until 8).map(i => col(s"f$i")): _*)
        val (labeled, centers) = graft.pipeline.CarClusteringPipeline.cluster(
          e, k = 3, restarts = 2, polishMoves = 50)
        val sizes = labeled.groupBy("cluster").agg(count(lit(1)).as("__n"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val n = sizes.values.sum
        // getOrElse: an empty cluster (absent from `sizes`) must degrade
        // to a failed recovery boolean, not a NoSuchElementException
        val wmean = (0 until 8).map { j =>
          (1 to 3).map(c => sizes.getOrElse(c, 0L).toDouble * centers(c - 1)(j)).sum / n }
        val rawRow = e.agg(avg(col("f0")).as("a0"),
          (1 until 8).map(i => avg(col(s"f$i")).as(s"a$i")): _*).head()
        val maxRel = (0 until 8).map { j =>
          val a = rawRow.getAs[Double](s"a$j")
          math.abs(wmean(j) - a) / (1.0 + math.abs(a)) }.max
        e.agg(count(lit(1)).as("n_points"),
            round(avg(col("f0")), 6).as("mean_f0_r"))
          .select(lit(3).cast("int").as("n_centers"), col("n_points"),
            lit(maxRel <= 1e-9).as("unscale_recovers_raw_means"),
            col("mean_f0_r"))
      },
      oracle = Some("""
        SELECT CAST(3 AS INTEGER) AS n_centers,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               TRUE AS unscale_recovers_raw_means,
               ROUND(AVG(CAST(embedding[1] AS DOUBLE)), 6) AS mean_f0_r
        FROM embeddings""")))

  // q106: kernel-density naive Bayes (M7, klaR semantics — the variant
  // BigDataProject.R:360's dead `usekernel = TRUE` was asking for; see
  // KdeNb's scaladoc for the e1071 library-bug finding). The fit's
  // deterministic surface — per-(class,feature) n, the bw.nrd0 bandwidth
  // (exact type-7 IQR + stddev_samp), and the density-grid range
  // [min-3bw, max+3bw] — is DuckDB-reproducible and hash-checked
  // (rounded 4, the q58 discipline for cross-engine double aggregates).
  // The fit-dependent grid itself is pinned by theorem booleans in the
  // q105 style: each density integrates to ~1, the Gaussian kernel
  // preserves the sample mean, and the codegen scoring pass normalizes
  // posteriors on every row. Golden row-for-row parity against an
  // independent twin lives in KdeNbSpec.
  private val q106: Seq[(String, QueryDef)] = Seq(
    "q106_kde_nb" -> QueryDef(
      fn = (s, d) => {
        import s.implicits._
        val ev = Tables(s, d, "events").select(
          col("event_type"), col("user_id").cast("double").as("user_id"),
          col("value").cast("double").as("value"))
        val model = graft.operators.KdeNb.fit(
          ev, Seq("user_id", "value"), "event_type")
        val means = ev.groupBy("event_type")
          .agg(avg("user_id").as("m_user_id"), avg("value").as("m_value"))
          .collect().flatMap(r => Seq(
            (r.getString(0), "user_id") -> r.getDouble(1),
            (r.getString(0), "value") -> r.getDouble(2))).toMap
        val scored = graft.operators.KdeNb.score(ev, model)
        val sumPost = model.classes.indices
          .map(i => col(s"posterior_$i")).reduce(_ + _)
        val sRow = scored.agg(count(lit(1)).as("cnt"),
          max(abs(sumPost - 1.0)).as("dev")).head()
        val scoredOk = sRow.getLong(0) == model.counts.values.sum &&
          sRow.getDouble(1) <= 1e-9
        val rows = model.densities.map { dn =>
          val dx = (dn.hi - dn.lo) / (model.gridN - 1)
          val integral = dn.ys.sum * dx
          val kdeMean = dn.ys.zipWithIndex
            .map { case (y, j) => (dn.lo + j * dx) * y }.sum * dx / integral
          val sMean = means((dn.label, dn.feature))
          (dn.label, dn.feature, dn.n, dn.bw, dn.lo, dn.hi,
            dn.ys.forall(_ >= 0) && math.abs(integral - 1.0) <= 0.005,
            math.abs(kdeMean - sMean) <= 1e-3 * (math.abs(sMean) + 1),
            scoredOk)
        }
        rows.toDF("label", "feature", "n", "bwu", "lou", "hiu",
            "integral_ok", "mean_ok", "scored_ok")
          .select(col("label"), col("feature"), col("n"),
            round(col("bwu"), 4).as("bw_r"), round(col("lou"), 4).as("lo_r"),
            round(col("hiu"), 4).as("hi_r"), col("integral_ok"),
            col("mean_ok"), col("scored_ok"))
          .orderBy("label", "feature")
      },
      oracle = Some("""
        WITH e AS (SELECT event_type AS label, CAST(user_id AS DOUBLE) AS u,
                          CAST(value AS DOUBLE) AS v FROM events),
        sv AS (SELECT label, 'user_id' AS feature, COUNT(u) AS n,
                      COALESCE(stddev_samp(u), 0) AS sd,
                      quantile_cont(u, 0.75) - quantile_cont(u, 0.25) AS iqr,
                      AVG(u) AS m, MIN(u) AS mn, MAX(u) AS mx
               FROM e GROUP BY label
               UNION ALL
               SELECT label, 'value', COUNT(v), COALESCE(stddev_samp(v), 0),
                      quantile_cont(v, 0.75) - quantile_cont(v, 0.25),
                      AVG(v), MIN(v), MAX(v)
               FROM e GROUP BY label),
        b AS (SELECT label, feature, n,
                     0.9 * (CASE WHEN LEAST(sd, iqr / 1.34) > 0 THEN LEAST(sd, iqr / 1.34)
                                 WHEN sd > 0 THEN sd
                                 WHEN ABS(m) > 0 THEN ABS(m) ELSE 1 END)
                         * POW(CAST(n AS DOUBLE), -0.2) AS bwu, mn, mx
              FROM sv)
        SELECT label, feature, CAST(n AS BIGINT) AS n, ROUND(bwu, 4) AS bw_r,
               ROUND(mn - 3 * bwu, 4) AS lo_r, ROUND(mx + 3 * bwu, 4) AS hi_r,
               TRUE AS integral_ok, TRUE AS mean_ok, TRUE AS scored_ok
        FROM b ORDER BY label, feature""")))
}
