package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Cleaning / preparation operators mirroring the reference pipeline's
  * semantics (see SURVEY.md §2.2-2.6; reference: BigDataProject.R:41-130):
  * schema normalization, median/mode imputation, IQR outlier capping,
  * quantile bucketing with R `cut` semantics, top-n-with-ties.
  *
  * Scale notes (100 TB): every op here is a single scan + (for the
  * quantile-based ones) one tiny driver round-trip for the break values —
  * the same shape R uses, but distributed. All quantiles for a multi-column
  * impute/cap are computed in ONE aggregate pass, not one scan per column.
  * Exact `percentile` (type-7, matches R/DuckDB quantile_cont) is the
  * default for oracle parity; pass `exact=false` to switch to
  * `approx_percentile` for cardinality-unbounded columns at scale.
  */
object Cleaning {

  /** P1 (BigDataProject.R:51): lowercase all column names. */
  def lowercaseColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase).toIndexedSeq: _*)

  /** P3 (BigDataProject.R:66-75): cast columns; bad strings → null, the
    * observable behavior of R's as.numeric-with-warning. */
  def castColumns(df: DataFrame, cols: Seq[String], to: String): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(to)))

  /** P4 (BigDataProject.R:61-63): first whitespace-separated word. */
  def firstWord(c: Column): Column = substring_index(c, " ", 1)

  private def pctExpr(c: String, probs: Seq[Double], exact: Boolean): Column = {
    val arr = probs.mkString("array(", ",", ")")
    if (exact) expr(s"percentile(`$c`, $arr)")
    else expr(s"approx_percentile(`$c`, $arr, 10000)")
  }

  /** One-pass exact quantiles for several columns (single scan). Returns
    * col -> prob-ordered values. Type-7 interpolation == R quantile ==
    * DuckDB quantile_cont. */
  def quantiles(df: DataFrame, cols: Seq[String], probs: Seq[Double],
                exact: Boolean = true): Map[String, Seq[Double]] = {
    val aggs = cols.map(c => pctExpr(c, probs, exact).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.map(c => c -> row.getSeq[Double](row.fieldIndex(c))).toMap
  }

  /** Exact type-7 quantiles via distributed sort + rank selection — the
    * 100-TB path for EXACT quantiles. The `percentile` aggregate (used by
    * [[quantiles]]) buffers every value of a group in one aggregation
    * buffer: fine at test scale, impossible at 100 TB. Here the values
    * are range-sorted across the cluster (sortBy shuffle), globally
    * indexed from partition offsets (zipWithIndex), and only the <= 2·|probs|
    * boundary order statistics are collected; interpolation mirrors the
    * Percentile aggregate's weighted form
    * (higher − pos)·lower + (pos − lower)·higher, so results agree
    * bit-for-bit (pinned in CleaningSpec). Genuine per-partition
    * imperative logic → the one sanctioned RDD use. */
  def sortedQuantiles(df: DataFrame, c: String, probs: Seq[Double]): Seq[Double] = {
    val sorted = df.select(col(c).cast("double")).na.drop()
      .rdd.map(_.getDouble(0)).sortBy(identity).zipWithIndex().map(_.swap)
      .cache()
    try {
      val n = sorted.count()
      if (n == 0) return probs.map(_ => Double.NaN)
      val positions = probs.map(p => p * (n - 1))
      val wanted = positions.flatMap(pos =>
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong)).toSet
      val stats = sorted.filter(kv => wanted.contains(kv._1)).collect().toMap
      positions.map { pos =>
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        if (hi == lo) stats(lo)
        else (hi - pos) * stats(lo) + (pos - lo) * stats(hi)
      }
    } finally sorted.unpersist(blocking = false)
  }

  /** A2 + F8 (BigDataProject.R:86-87): replace nulls with the column
    * median, all medians from one aggregate pass. */
  def medianImpute(df: DataFrame, cols: Seq[String],
                   exact: Boolean = true): DataFrame = {
    val med = quantiles(df, cols, Seq(0.5), exact)
    cols.foldLeft(df)((d, c) => d.withColumn(c, coalesce(col(c), lit(med(c).head))))
  }

  /** A3 (BigDataProject.R:89-94): most frequent value, ties broken by
    * value ascending (R `table` sorts levels lexically). */
  def mode(df: DataFrame, c: String): Option[Any] =
    df.filter(col(c).isNotNull).groupBy(col(c)).count()
      .orderBy(desc("count"), asc(c))
      .limit(1).collect().headOption.map(_.get(0))

  /** F8 via A3: impute nulls in categorical columns with the mode. */
  def modeImpute(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      mode(d, c) match {
        case Some(m) => d.withColumn(c, coalesce(col(c), lit(m)))
        case None    => d
      }
    }

  /** A4 + F8 (BigDataProject.R:99-115 cap_outliers_iqr): clamp each column
    * to [q1 - k*iqr, q3 + k*iqr]. Nulls stay null (R ifelse keeps NA —
    * deliberately NOT greatest/least, which would swallow nulls). All
    * bounds from one aggregate pass. */
  def iqrCap(df: DataFrame, cols: Seq[String], k: Double = 1.5,
             exact: Boolean = true): DataFrame = {
    // single column → distributed sort-selection (bit-identical to the
    // percentile aggregate, scales past its one-buffer limit); several
    // columns → one multi-quantile aggregate scan beats |cols| sorts
    val q =
      if (exact && cols.size == 1)
        Map(cols.head -> sortedQuantiles(df, cols.head, Seq(0.25, 0.75)))
      else quantiles(df, cols, Seq(0.25, 0.75), exact)
    cols.foldLeft(df) { (d, c) =>
      val Seq(q1, q3) = q(c)
      val iqr = q3 - q1
      val lb = q1 - k * iqr
      val ub = q3 + k * iqr
      d.withColumn(c,
        when(col(c) > ub, lit(ub))
          .when(col(c) < lb, lit(lb))
          .otherwise(col(c)))
    }
  }

  /** Winsorize: clamp each column to its [pLo, pHi] exact percentiles
    * (all bounds from one aggregate pass). This is the rule the
    * reference's committed golden outputs actually reflect (1%/99% — e.g.
    * car_id 1,2,3 → 3.04 = type-7 quantile(x, .01); see
    * car_prices_cleaned.csv), even though the current script text does
    * 1.5*IQR capping. Both are provided; golden tests use this one. */
  def winsorize(df: DataFrame, cols: Seq[String], pLo: Double = 0.01,
                pHi: Double = 0.99, exact: Boolean = true): DataFrame = {
    val q = quantiles(df, cols, Seq(pLo, pHi), exact)
    cols.foldLeft(df) { (d, c) =>
      val Seq(lo, hi) = q(c)
      d.withColumn(c, clamp(col(c), lo, hi))
    }
  }

  /** Clamp expression form (no quantiles), null-preserving. */
  def clamp(c: Column, lb: Double, ub: Double): Column =
    when(c > ub, lit(ub)).when(c < lb, lit(lb)).otherwise(c)

  /** C6 (BigDataProject.R:123-128; associationRules.R:24-51): R
    * `cut(x, breaks, labels, include.lowest=TRUE)` — intervals (a,b],
    * first interval [b0,b1], out-of-range → null. */
  def cutLabels(c: Column, breaks: Seq[Double], labels: Seq[String]): Column = {
    require(breaks.length == labels.length + 1, "breaks must be labels+1")
    val low = breaks.head
    val base: Column = when(c.isNull || c < low || c > breaks.last, lit(null))
    val chain = labels.zip(breaks.tail).foldLeft(base) {
      case (acc, (l, b)) => acc.when(c <= b, lit(l))
    }
    chain.otherwise(lit(null))
  }

  /** A5 + C6: bucket a column by its own quantile breaks (default
    * quartiles → 4 labels). One agg pass for breaks, then a when-chain. */
  def quantileBucket(df: DataFrame, c: String, outCol: String,
                     labels: Seq[String] = Seq("Low", "Medium", "High", "VeryHigh"),
                     exact: Boolean = true): DataFrame = {
    val n = labels.length
    val probs = (0 to n).map(_.toDouble / n)
    val breaks = quantiles(df, Seq(c), probs, exact)(c)
    df.withColumn(outCol, cutLabels(col(c), breaks, labels))
  }

  /** A7 (BigDataProject.R:153): top-n by a measure, KEEPING ties (R
    * top_n semantics) — rank(), not row_number()/limit. */
  def topNWithTies(df: DataFrame, orderCol: String, n: Int): DataFrame =
    df.withColumn("__rk", rank().over(Window.orderBy(desc(orderCol))))
      .filter(col("__rk") <= n).drop("__rk")

  /** A1 (BigDataProject.R:78,83): one-row null-count-per-column frame. */
  def nullCounts(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val cs = if (cols.nonEmpty) cols else df.columns.toSeq
    val aggs = cs.map(c => sum(col(c).isNull.cast("long")).as(c))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** A6: value counts, count desc then value asc (pinned tie-break). */
  def valueCounts(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c)).count().orderBy(desc("count"), asc(c))
}
