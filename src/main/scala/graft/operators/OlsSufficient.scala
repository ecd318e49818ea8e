package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Single-pass OLS via exact sufficient statistics + closed-form solve
  * (M3, lm() analog — reference BigDataProject.R:305-306).
  *
  * The 100-TB shape: ONE narrow aggregation computes X'X / X'y / y'y as
  * exact DECIMAL sums (inputs have fixed decimal precision, so the sums
  * are order-independent and cross-engine-deterministic), then the
  * (p+1)-dimensional normal equations are solved in closed form by
  * Cramer's rule — generated as plain arithmetic expressions over the
  * one-row stats frame. No iterative solver, no vector assembly, no
  * second pass. Coefficient t-values come from the same stats
  * (se_j^2 = s^2 * (X'X)^-1_jj, s^2 = (y'y - b'X'y)/(n-p)).
  *
  * Every stage is a list of SQL expression strings used BOTH by the Spark
  * plan (selectExpr) and by the DuckDB oracle (CTE chain) — identical
  * operation trees over exact DECIMAL sums, so the intermediate doubles
  * are bit-identical up to the determinant polynomials; the emitted
  * estimate/t columns round at 6dp (see the rowExprs comment).
  *
  * Determinant expansion is O(p!) in expression size — fine for the
  * handful of regressors lm-style summaries are used with; beyond that
  * you'd switch to the iterative solver (MLOps.ols).
  */
object OlsSufficient {

  private def minor(m: Vector[Vector[String]], i: Int, j: Int): Vector[Vector[String]] =
    m.zipWithIndex.collect { case (row, r) if r != i =>
      row.zipWithIndex.collect { case (v, c) if c != j => v }
    }

  /** Cofactor-expansion determinant as an expression string. */
  private def det(m: Vector[Vector[String]]): String = m.length match {
    case 1 => m(0)(0)
    case 2 => s"((${m(0)(0)} * ${m(1)(1)}) - (${m(0)(1)} * ${m(1)(0)}))"
    case k =>
      (0 until k).map { j =>
        val t = s"(${m(0)(j)} * ${det(minor(m, 0, j))})"
        if (j == 0) t else if (j % 2 == 0) s"+ $t" else s"- $t"
      }.mkString("(", " ", ")")
  }

  /** Stage-wise expression lists for p features + intercept.
    * Returns (aggExprs, castExprs, detExprs, estExprs, rowExprs) where
    * rowExprs are (termLiteral, estimateExpr, tValueExpr). */
  def stages(features: Seq[String], label: String,
             decimal: String = "DECIMAL(27,4)")
      : (Seq[String], Seq[String], Seq[String], Seq[String], Seq[(String, String, String)]) = {
    val p = features.length
    // x0 = intercept column of ones; xi = features(i-1)
    def x(i: Int): String = if (i == 0) "1" else features(i - 1)
    def sumName(i: Int, j: Int): String =
      if (i == 0 && j == 0) "nd" else s"s${i}_$j"
    def sumYName(i: Int): String = if (i == 0) "sy" else s"s${i}_y"

    val aggExprs = scala.collection.mutable.ArrayBuffer[String]()
    val castExprs = scala.collection.mutable.ArrayBuffer[String]()
    aggExprs += "COUNT(*) AS n"
    castExprs += "CAST(n AS DOUBLE) AS nd"
    for (i <- 0 to p; j <- i to p) if (!(i == 0 && j == 0)) {
      val prod = if (i == 0) x(j) else s"${x(i)} * ${x(j)}"
      aggExprs += s"SUM(CAST($prod AS $decimal)) AS _${sumName(i, j)}"
      castExprs += s"CAST(_${sumName(i, j)} AS DOUBLE) AS ${sumName(i, j)}"
    }
    for (i <- 0 to p) {
      val prod = if (i == 0) label else s"${x(i)} * $label"
      aggExprs += s"SUM(CAST($prod AS $decimal)) AS _${sumYName(i)}"
      castExprs += s"CAST(_${sumYName(i)} AS DOUBLE) AS ${sumYName(i)}"
    }
    aggExprs += s"SUM(CAST($label * $label AS $decimal)) AS _syy"
    castExprs += "CAST(_syy AS DOUBLE) AS syy"

    val a = Vector.tabulate(p + 1, p + 1)((i, j) =>
      if (i <= j) sumName(i, j) else sumName(j, i))
    val b = Vector.tabulate(p + 1)(sumYName)

    val detExprs = (s"${det(a)} AS det_a" +:
      (0 to p).map { j =>
        // A with column j replaced by b (Cramer numerator)
        val aj = Vector.tabulate(p + 1, p + 1)((r, c) => if (c == j) b(r) else a(r)(c))
        s"${det(aj)} AS det_b$j"
      }) ++ (0 to p).map(j => s"${det(minor(a, j, j))} AS cof$j")

    val estExprs =
      (0 to p).map(j => s"det_b$j / det_a AS est$j") ++
        (0 to p).map(j => s"cof$j / det_a AS inv$j") :+ {
        val bxy = (0 to p).map(j => s"((det_b$j / det_a) * ${b(j)})")
          .reduce((x1, x2) => s"($x1 + $x2)")
        s"(syy - $bxy) / (nd - ${(p + 1).toDouble}) AS s2"
      }

    // s2 = 0 on an exactly-consistent system (zero residuals): the t
    // statistic is undefined — NULL, not a divide-by-zero (ANSI mode
    // makes x/0 an error, and the CASE must guard BOTH engines)
    def tExpr(j: Int): String =
      s"CASE WHEN s2 > 0 THEN est$j / sqrt(s2 * inv$j) ELSE NULL END"
    // outputs round at 6dp: the DECIMAL sums are exact and order-free,
    // but the O(p!) determinant POLYNOMIAL over them evaluates with
    // engine-specific last-ulp behavior once the summed magnitudes grow
    // (sf0.1 cross-engine probe: estimates bit-equal, t-values off by
    // one ulp) — 6dp is far above the ulp band and far below any
    // statistical meaning
    val rowExprs = ("'(intercept)'", "round(est0, 6)", s"round(${tExpr(0)}, 6)") +:
      features.zipWithIndex.map { case (f, i) =>
        (s"'$f'", s"round(est${i + 1}, 6)", s"round(${tExpr(i + 1)}, 6)")
      }
    (aggExprs.toSeq, castExprs.toSeq, detExprs, estExprs, rowExprs)
  }

  /** The Spark plan built from the shared stage expressions. */
  def fit(df: DataFrame, features: Seq[String], label: String): DataFrame = {
    val (aggE, castE, detE, estE, rowE) = stages(features, label)
    // cache the one-row stats frame: the per-term union branches would
    // otherwise each re-run the full aggregation scan (p+1 passes)
    val stats = df.agg(expr(aggE.head), aggE.tail.map(expr): _*)
      .selectExpr(castE: _*)
      .selectExpr("*" +: detE: _*)
      .selectExpr("*" +: estE: _*)
      .cache()
    rowE.map { case (term, est, t) =>
      stats.selectExpr(s"$term AS term", s"$est AS estimate", s"$t AS t_value")
    }.reduce(_.unionByName(_)).orderBy("term")
  }

  /** The DuckDB oracle text built from the SAME stage expressions. */
  def oracleSql(table: String, features: Seq[String], label: String): String = {
    val (aggE, castE, detE, estE, rowE) = stages(features, label)
    val rows = rowE.map { case (term, est, t) =>
      s"SELECT $term AS term, $est AS estimate, $t AS t_value FROM e"
    }.mkString("\n UNION ALL ")
    s"""
      WITH s0 AS (SELECT ${aggE.mkString(", ")} FROM $table),
      s AS (SELECT ${castE.mkString(", ")} FROM s0),
      d AS (SELECT s.*, ${detE.mkString(", ")} FROM s),
      e AS (SELECT d.*, ${estE.mkString(", ")} FROM d)
      $rows ORDER BY term"""
  }
}
