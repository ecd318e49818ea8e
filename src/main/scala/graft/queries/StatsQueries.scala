package graft.queries

import graft.Tables
import graft.functions.Stats
import org.apache.spark.sql.functions._

/** Hypothesis-test operators (SURVEY.md §2.9, T1-T6). The distributed part
  * is a single sufficient-statistics aggregate; the statistic itself is
  * closed-form driver math. Oracle SQL recomputes the same statistic from
  * the same aggregates in DuckDB (p-values need a t/F CDF DuckDB lacks, so
  * the oracle-checked projection excludes them; the library functions
  * return them via commons-math3).
  */
object StatsQueries {

  val entries: Seq[(String, QueryDef)] = Seq(

    // T1: Welch two-sample t-test (unequal variances) on event values.
    "q27_welch_ttest" -> QueryDef(
      fn = (s, d) =>
        Stats.welchT(Tables(s, d, "events"), "value", "event_type", "purchase", "signup")
          .select(col("group1"), col("group2"), col("n1"), col("n2"),
            round(col("mean1"), 4).as("mean1"), round(col("mean2"), 4).as("mean2"),
            round(col("t_stat"), 4).as("t_stat"), round(col("df"), 2).as("welch_df")),
      oracle = Some("""
        WITH g1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1, AVG(value) AS m1, var_samp(value) AS v1
                    FROM events WHERE event_type = 'purchase'),
        g2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n2, AVG(value) AS m2, var_samp(value) AS v2
               FROM events WHERE event_type = 'signup')
        SELECT 'purchase' AS group1, 'signup' AS group2, n1, n2,
               ROUND(m1, 4) AS mean1, ROUND(m2, 4) AS mean2,
               ROUND((m1 - m2) / sqrt(v1/n1 + v2/n2), 4) AS t_stat,
               ROUND(power(v1/n1 + v2/n2, 2) /
                     (power(v1/n1, 2)/(n1-1) + power(v2/n2, 2)/(n2-1)), 2) AS welch_df
        FROM g1 CROSS JOIN g2""")),

    // T2: one-way ANOVA F across all event types.
    "q28_anova_f" -> QueryDef(
      fn = (s, d) =>
        Stats.anovaF(Tables(s, d, "events"), "value", "event_type")
          .select(col("k_groups").cast("long").as("k_groups"), col("n_total"),
            round(col("grand_mean"), 4).as("grand_mean"),
            round(col("f_stat"), 4).as("f_stat")),
      oracle = Some("""
        WITH g AS (SELECT event_type, COUNT(*) AS n, AVG(value) AS m, var_samp(value) AS v
                   FROM events GROUP BY event_type),
        tot AS (SELECT SUM(m*n)/SUM(n) AS grand, COUNT(*) AS k, SUM(n) AS n FROM g),
        parts AS (SELECT SUM(g.n * power(g.m - tot.grand, 2)) AS ssb,
                         SUM((g.n - 1) * g.v) AS ssw FROM g CROSS JOIN tot)
        SELECT CAST(tot.k AS BIGINT) AS k_groups, CAST(tot.n AS BIGINT) AS n_total,
               ROUND(tot.grand, 4) AS grand_mean,
               ROUND((parts.ssb/(tot.k-1)) / (parts.ssw/(tot.n-tot.k)), 4) AS f_stat
        FROM tot CROSS JOIN parts""")),

    // T4: Pearson correlation test (r and its t statistic).
    "q29_corr_test" -> QueryDef(
      fn = (s, d) =>
        Stats.corrTest(Tables(s, d, "lineitem"), "l_quantity", "l_extendedprice")
          .select(col("x"), col("y"), col("n"), round(col("r"), 6).as("r"),
            round(col("t_stat"), 4).as("t_stat")),
      oracle = Some("""
        WITH s AS (SELECT corr(l_quantity, l_extendedprice) AS r, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem)
        SELECT 'l_quantity' AS x, 'l_extendedprice' AS y, n, ROUND(r, 6) AS r,
               ROUND(r * sqrt((n - 2) / (1 - r*r)), 4) AS t_stat
        FROM s""")),

    // T3: Tukey HSD post-hoc — the SQL-expressible core (pairwise diffs,
    // pooled-MSW standard errors, studentized-range q statistics) from
    // exact decimal sufficient statistics, fully distributed (groupBy +
    // tiny self-join; no driver-side stats). The studentized-range CDF
    // (ptukey → lwr/upr/p_adj) is NOT SQL-expressible; that part lives in
    // Stats.tukeyHSD and is pinned against R reference values in
    // StatsSpec.
    "q40_tukey_hsd" -> QueryDef(
      fn = (s, d) => {
        // cache the k-row group stats: they feed the pair self-join (both
        // sides) AND the pooled-MSW aggregate — uncached, that is three
        // full scans of the fact table
        val g = Tables(s, d, "events").groupBy("event_type").agg(
          count(lit(1)).as("n"),
          expr("CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE) / 100").as("s1"),
          expr("CAST(CAST(SUM(CAST(value * value AS DECIMAL(22,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000").as("s2"))
          .select(col("event_type"), col("n"),
            expr("s1 / n").as("m"),
            expr("(s2 - ((s1 * s1) / n)) / (n - 1)").as("v"))
          .cache()
        val w = g.agg(
          expr("SUM((n - 1) * v) / (SUM(n) - COUNT(*))").as("msw"))
        val a = g.select(col("event_type").as("a_et"), col("n").as("a_n"), col("m").as("a_m"))
        val b = g.select(col("event_type").as("b_et"), col("n").as("b_n"), col("m").as("b_m"))
        a.join(b, col("a_et") > col("b_et")).crossJoin(broadcast(w))
          .select(
            concat(col("a_et"), lit("-"), col("b_et")).as("pair"),
            round(expr("a_m - b_m"), 4).as("diff"),
            round(expr("sqrt((msw / 2.0) * ((1.0 / a_n) + (1.0 / b_n)))"), 4).as("se"),
            round(expr("abs(a_m - b_m) / sqrt((msw / 2.0) * ((1.0 / a_n) + (1.0 / b_n)))"), 4).as("q_stat"))
          .orderBy("pair")
      },
      oracle = Some("""
        WITH g AS (SELECT event_type, COUNT(*) AS n,
                          CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE) / 100 AS s1,
                          CAST(CAST(SUM(CAST(value * value AS DECIMAL(22,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000 AS s2
                   FROM events GROUP BY event_type),
        gg AS (SELECT event_type, n, s1 / n AS m,
                      (s2 - ((s1 * s1) / n)) / (n - 1) AS v FROM g),
        w AS (SELECT SUM((n - 1) * v) / (SUM(n) - COUNT(*)) AS msw FROM gg)
        SELECT a.event_type || '-' || b.event_type AS pair,
               ROUND(a.m - b.m, 4) AS diff,
               ROUND(sqrt((msw / 2.0) * ((1.0 / a.n) + (1.0 / b.n))), 4) AS se,
               ROUND(abs(a.m - b.m) / sqrt((msw / 2.0) * ((1.0 / a.n) + (1.0 / b.n))), 4) AS q_stat
        FROM gg a JOIN gg b ON a.event_type > b.event_type CROSS JOIN w
        ORDER BY pair""")),

    // chi-squared test of independence (status × priority) — T-family
    // extension over the contingency table; integer cell basis, the Σ
    // over 15 cells is the only order-sensitive step (round 4 absorbs).
    "q78_chi2_independence" -> QueryDef(
      fn = (s, d) =>
        Stats.chi2Independence(Tables(s, d, "orders"), "o_orderstatus", "o_orderpriority")
          .select(round(col("chi2"), 4).as("chi2"), col("dof"), col("n")),
      oracle = Some("""
        WITH cells AS (SELECT o_orderstatus AS a, o_orderpriority AS b, COUNT(*) AS obs
                       FROM orders GROUP BY 1, 2),
        ra AS (SELECT a, SUM(obs) AS ra FROM cells GROUP BY a),
        cb AS (SELECT b, SUM(obs) AS cb FROM cells GROUP BY b),
        tot AS (SELECT SUM(obs) AS n, COUNT(DISTINCT a) AS nr, COUNT(DISTINCT b) AS nc FROM cells)
        SELECT ROUND(SUM(((obs - ((CAST(ra AS DOUBLE) * cb) / n)) * (obs - ((CAST(ra AS DOUBLE) * cb) / n))) / ((CAST(ra AS DOUBLE) * cb) / n)), 4) AS chi2,
               CAST(MIN((nr - 1) * (nc - 1)) AS BIGINT) AS dof,
               CAST(MIN(n) AS BIGINT) AS n
        FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot""")),

    // T5: confusion matrix + accuracy + Cohen's kappa. Prediction is a
    // deterministic value-threshold rule so the operator is exercised
    // without an ML model; fully SQL-expressible.
    "q41_confusion_matrix" -> QueryDef(
      fn = (s, d) => {
        val ev = Tables(s, d, "events")
          .withColumn("pred", when(col("value") >= 100, "high").otherwise("low"))
          .withColumn("actual", when(col("event_id") % 2 === 0, "high").otherwise("low"))
        Stats.confusionMatrix(ev, "pred", "actual")
          .select(col("class"), col("tp"), col("pred_n"), col("actual_n"),
            round(col("precision"), 6).as("precision"), round(col("recall"), 6).as("recall"),
            round(col("accuracy"), 6).as("accuracy"), round(col("kappa"), 6).as("kappa"))
          .orderBy("class")
      },
      oracle = Some("""
        WITH t AS (SELECT CASE WHEN value >= 100 THEN 'high' ELSE 'low' END AS pred,
                          CASE WHEN event_id % 2 = 0 THEN 'high' ELSE 'low' END AS actual
                   FROM events),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM t),
        acc AS (SELECT SUM(CASE WHEN pred = actual THEN 1 ELSE 0 END) / (SELECT total FROM n) AS po FROM t),
        pe AS (SELECT SUM(pc * ac) AS pe FROM (
                 SELECT c.cls,
                   (SELECT COUNT(*) FROM t WHERE pred = c.cls) / (SELECT total FROM n) AS pc,
                   (SELECT COUNT(*) FROM t WHERE actual = c.cls) / (SELECT total FROM n) AS ac
                 FROM (SELECT DISTINCT pred AS cls FROM t UNION SELECT DISTINCT actual FROM t) c)),
        per AS (SELECT c.cls AS class,
                  CAST((SELECT COUNT(*) FROM t WHERE pred = c.cls AND actual = c.cls) AS BIGINT) AS tp,
                  CAST((SELECT COUNT(*) FROM t WHERE pred = c.cls) AS BIGINT) AS pred_n,
                  CAST((SELECT COUNT(*) FROM t WHERE actual = c.cls) AS BIGINT) AS actual_n
                FROM (SELECT DISTINCT pred AS cls FROM t UNION SELECT DISTINCT actual FROM t) c)
        SELECT per.class, per.tp, per.pred_n, per.actual_n,
               ROUND(per.tp / CAST(per.pred_n AS DOUBLE), 6) AS "precision",
               ROUND(per.tp / CAST(per.actual_n AS DOUBLE), 6) AS "recall",
               ROUND(acc.po, 6) AS accuracy,
               ROUND((acc.po - pe.pe) / (1 - pe.pe), 6) AS kappa
        FROM per CROSS JOIN acc CROSS JOIN pe ORDER BY per.class"""))
  )
}
