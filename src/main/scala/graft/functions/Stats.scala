package graft.functions

import org.apache.commons.math3.distribution.{FDistribution, NormalDistribution, TDistribution}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistical-test operators (SURVEY.md §2.9). Each is an aggregate →
  * tiny-scalar pipeline: ONE distributed groupBy/agg pass computes the
  * sufficient statistics (n, mean, var per group), then the closed-form
  * statistic and its p-value (commons-math3 distributions, shipped in
  * /opt/spark/jars) are evaluated on the driver. At 100 TB the agg is the
  * only data-sized work and it is map-side-combinable.
  *
  * Reference semantics: BigDataProject.R:178-270 (t.test Welch default,
  * aov/ANOVA, TukeyHSD, cor.test).
  */
object Stats {

  final case class GroupStat(group: String, n: Long, mean: Double, variance: Double)

  private def groupStats(df: DataFrame, value: String, group: String): Seq[GroupStat] =
    df.filter(col(value).isNotNull && col(group).isNotNull)
      .groupBy(col(group).cast("string").as("g"))
      .agg(count(lit(1)).as("n"), avg(col(value)).as("m"), var_samp(col(value)).as("v"))
      .collect()
      .map(r => GroupStat(r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_.group)

  /** T1 (BigDataProject.R:178-188): Welch two-sample t-test (unequal
    * variances, Welch–Satterthwaite df, two-sided p). */
  def welchT(df: DataFrame, value: String, group: String,
             g1: String, g2: String): DataFrame = {
    val spark = df.sparkSession
    val stats = groupStats(df.filter(col(group).isin(g1, g2)), value, group)
      .map(s => s.group -> s).toMap
    val (a, b) = (stats(g1), stats(g2))
    val se2 = a.variance / a.n + b.variance / b.n
    val t = (a.mean - b.mean) / math.sqrt(se2)
    val dfree = se2 * se2 /
      (math.pow(a.variance / a.n, 2) / (a.n - 1) + math.pow(b.variance / b.n, 2) / (b.n - 1))
    val p = 2.0 * new TDistribution(dfree).cumulativeProbability(-math.abs(t))
    import spark.implicits._
    Seq((g1, g2, a.n, b.n, a.mean, b.mean, t, dfree, p))
      .toDF("group1", "group2", "n1", "n2", "mean1", "mean2", "t_stat", "df", "p_value")
  }

  /** T2 (BigDataProject.R:197-206 etc.): one-way ANOVA F-test via the
    * SSB/SSW decomposition from per-group sufficient statistics. */
  def anovaF(df: DataFrame, value: String, group: String): DataFrame = {
    val spark = df.sparkSession
    val gs = groupStats(df, value, group)
    val n = gs.map(_.n).sum
    val k = gs.length
    val grand = gs.map(s => s.mean * s.n).sum / n
    val ssb = gs.map(s => s.n * math.pow(s.mean - grand, 2)).sum
    val ssw = gs.map(s => (s.n - 1) * s.variance).sum
    val df1 = (k - 1).toDouble
    val df2 = (n - k).toDouble
    val f = (ssb / df1) / (ssw / df2)
    val p = 1.0 - new FDistribution(df1, df2).cumulativeProbability(f)
    import spark.implicits._
    Seq((k, n, grand, ssb, ssw, f, df1, df2, p))
      .toDF("k_groups", "n_total", "grand_mean", "ss_between", "ss_within",
        "f_stat", "df1", "df2", "p_value")
  }

  /** T4 (BigDataProject.R:224-233): Pearson correlation test —
    * r, t = r*sqrt((n-2)/(1-r^2)), two-sided p. */
  def corrTest(df: DataFrame, x: String, y: String): DataFrame = {
    val spark = df.sparkSession
    val row = df.filter(col(x).isNotNull && col(y).isNotNull)
      .agg(corr(col(x), col(y)).as("r"), count(lit(1)).as("n")).head()
    val r = row.getDouble(0)
    val n = row.getLong(1)
    val t = r * math.sqrt((n - 2) / (1 - r * r))
    val p = 2.0 * new TDistribution((n - 2).toDouble).cumulativeProbability(-math.abs(t))
    import spark.implicits._
    Seq((x, y, n, r, t, p)).toDF("x", "y", "n", "r", "t_stat", "p_value")
  }

  /** Studentized-range CDF P(Q <= q | k means, df degrees of freedom),
    * needed by Tukey HSD (T3). Not in commons-math3; computed by direct
    * numerical integration of the classic double integral:
    *   P(q) = ∫ f_s(s) [ k ∫ φ(z) (Φ(z) − Φ(z − q s))^{k−1} dz ] ds
    * with f_s the density of sqrt(chi2_df/df) (infinite-df: inner integral
    * only). Gauss–Legendre on a clipped range; accurate to ~1e-6, which is
    * far inside the p-value tolerance for reporting.
    */
  def ptukey(q: Double, k: Int, dfree: Double): Double = {
    if (q <= 0) return 0.0
    val norm = new NormalDistribution(0, 1)
    // inner: P(range of k std normals <= w)
    def prangeInner(w: Double): Double = {
      val (lo, hi) = (-8.0, 8.0)
      val nPts = 256
      val h = (hi - lo) / nPts
      var acc = 0.0
      var i = 0
      while (i < nPts) {
        val z = lo + (i + 0.5) * h
        val phi = math.exp(-0.5 * z * z) / math.sqrt(2 * math.Pi)
        val inner = norm.cumulativeProbability(z) - norm.cumulativeProbability(z - w)
        acc += phi * math.pow(math.max(inner, 0.0), k - 1) * h
        i += 1
      }
      k * acc
    }
    if (dfree > 1e5 || dfree.isInfinite) return math.min(1.0, prangeInner(q))
    // outer: integrate over s ~ sqrt(chi2_df / df); density
    // f(s) = 2 * (df/2)^(df/2) / Gamma(df/2) * s^(df-1) * exp(-df*s^2/2)
    val lnC = math.log(2) + (dfree / 2) * math.log(dfree / 2) -
      org.apache.commons.math3.special.Gamma.logGamma(dfree / 2)
    val sHi = 1.0 + 10.0 / math.sqrt(dfree)
    val sLo = math.max(0.0, 1.0 - 10.0 / math.sqrt(dfree))
    val nPts = 160
    val h = (sHi - sLo) / nPts
    var acc = 0.0
    var i = 0
    while (i < nPts) {
      val s = sLo + (i + 0.5) * h
      val lnf = lnC + (dfree - 1) * math.log(s) - dfree * s * s / 2
      acc += math.exp(lnf) * prangeInner(q * s) * h
      i += 1
    }
    math.min(1.0, math.max(0.0, acc))
  }

  /** T3 (BigDataProject.R:205 etc.): Tukey HSD post-hoc — all pairwise
    * mean differences with studentized-range adjusted p-values and 95%
    * family-wise confidence intervals. One agg pass; O(k^2) driver math. */
  def tukeyHSD(df: DataFrame, value: String, group: String,
               conf: Double = 0.95): DataFrame = {
    val spark = df.sparkSession
    val gs = groupStats(df, value, group)
    val k = gs.length
    val n = gs.map(_.n).sum
    val dfW = (n - k).toDouble
    val msw = gs.map(s => (s.n - 1) * s.variance).sum / dfW
    // critical q at family confidence level (bisection on ptukey)
    def qCrit(p: Double): Double = {
      var lo = 0.0; var hi = 20.0
      var it = 0
      while (it < 60) { val mid = (lo + hi) / 2
        if (ptukey(mid, k, dfW) < p) lo = mid else hi = mid
        it += 1 }
      (lo + hi) / 2
    }
    val qc = qCrit(conf)
    val rows = for {
      i <- gs.indices; j <- 0 until i
    } yield {
      val (a, b) = (gs(i), gs(j))
      val diff = a.mean - b.mean
      val se = math.sqrt(msw / 2 * (1.0 / a.n + 1.0 / b.n))
      val q = math.abs(diff) / se
      val pAdj = 1.0 - ptukey(q, k, dfW)
      (s"${a.group}-${b.group}", diff, diff - qc * se, diff + qc * se, pAdj)
    }
    import spark.implicits._
    rows.toDF("pair", "diff", "lwr", "upr", "p_adj").orderBy("pair")
  }

  /** T5 (BigDataProject.R:363-364): confusion matrix + accuracy + Cohen's
    * kappa from one crosstab pass (caret::confusionMatrix essentials). */
  def confusionMatrix(df: DataFrame, pred: String, label: String): DataFrame = {
    val spark = df.sparkSession
    val counts = df.groupBy(col(pred).cast("string").as("p"),
        col(label).cast("string").as("l"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val n = counts.map(_._3).sum.toDouble
    val classes = (counts.map(_._1) ++ counts.map(_._2)).distinct.sorted
    val po = counts.filter(c => c._1 == c._2).map(_._3).sum / n
    val pe = classes.map { c =>
      val rowMarg = counts.filter(_._1 == c).map(_._3).sum / n
      val colMarg = counts.filter(_._2 == c).map(_._3).sum / n
      rowMarg * colMarg
    }.sum
    val kappa = (po - pe) / (1 - pe)
    import spark.implicits._
    val perClass = classes.map { c =>
      val tp = counts.filter(x => x._1 == c && x._2 == c).map(_._3).sum.toDouble
      val predC = counts.filter(_._1 == c).map(_._3).sum.toDouble
      val actualC = counts.filter(_._2 == c).map(_._3).sum.toDouble
      val prec = if (predC > 0) tp / predC else Double.NaN
      val rec = if (actualC > 0) tp / actualC else Double.NaN
      (c, tp.toLong, predC.toLong, actualC.toLong, prec, rec, po, kappa)
    }
    perClass.toSeq.toDF("class", "tp", "pred_n", "actual_n", "precision", "recall",
      "accuracy", "kappa").orderBy("class")
  }

  /** Chi-squared test of independence over a two-way contingency table —
    * fully distributed (one groupBy for cells, two tiny margin
    * aggregations, no collect): chi2 = Σ (obs − exp)²/exp with
    * exp = rowMargin·colMargin/n. Returns (chi2, dof, n). The cell count
    * basis is integer, so the per-cell terms are cross-engine-identical;
    * only the Σ over cells is order-sensitive (rounding absorbs). */
  def chi2Independence(df: DataFrame, a: String, b: String): DataFrame = {
    val cells = df.groupBy(col(a).cast("string").as("a"), col(b).cast("string").as("b"))
      .agg(count(lit(1)).as("obs"))
    val ra = cells.groupBy("a").agg(sum("obs").as("ra"))
    val cb = cells.groupBy("b").agg(sum("obs").as("cb"))
    val tot = cells.agg(sum("obs").as("n"),
      countDistinct(col("a")).as("nr"), countDistinct(col("b")).as("nc"))
    cells.join(ra, "a").join(cb, "b").crossJoin(broadcast(tot))
      .agg(
        sum(expr("((obs - ((CAST(ra AS DOUBLE) * cb) / n)) * (obs - ((CAST(ra AS DOUBLE) * cb) / n))) / ((CAST(ra AS DOUBLE) * cb) / n)"))
          .as("chi2"),
        first(expr("(nr - 1) * (nc - 1)")).as("dof"),
        first(col("n")).as("n"))
  }
}
