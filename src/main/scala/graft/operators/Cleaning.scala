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

  /** Exact type-7 quantiles via SKETCH-BRACKETED SELECTION — the 100-TB
    * path for EXACT quantiles. The `percentile` aggregate (used by
    * [[quantiles]]) buffers every value of a group in one aggregation
    * buffer: fine at test scale, impossible at 100 TB. A full
    * distributed sort works but pays a whole-data range shuffle (and the
    * round-2 RDD sortBy + zipWithIndex version re-executed that sort per
    * lineage action — 15x super-linear at a 10x scale-up).
    *
    * Here: pass 1 aggregates count + approx_percentile at padded ranks
    * (rank error <= n/accuracy) to bracket each wanted order statistic;
    * pass 2 counts values below each bracket and inside it; pass 3
    * collects only the bracket's members (thousands, not millions) and
    * selects the exact order statistics locally. If a sketch bracket
    * misses (rank drift beyond the padding) the padding doubles and the
    * scan pair reruns — never observed, but correctness does not depend
    * on the sketch. All scans are narrow single-column aggregates: no
    * shuffle, no sort of the data.
    *
    * Interpolation mirrors the Percentile aggregate's weighted form
    * (higher − pos)·lower + (pos − lower)·higher, so results agree
    * bit-for-bit (pinned in CleaningSpec). */
  def sortedQuantiles(df: DataFrame, c: String, probs: Seq[Double]): Seq[Double] = {
    val vals = df.select(col(c).cast("double").as("__v")).na.drop()
    val accuracy = 10000
    val head1 = vals.agg(count(lit(1)).as("n"),
      min("__v").as("mn"), max("__v").as("mx")).head()
    val n = head1.getLong(0)
    if (n == 0) return probs.map(_ => Double.NaN)
    val (mn, mx) = (head1.getDouble(1), head1.getDouble(2))
    val positions = probs.map(p => p * (n - 1))
    val ranks = positions.flatMap(pos =>
      Seq(math.floor(pos).toLong, math.ceil(pos).toLong)).distinct.sorted

    var pad = 2.0 / accuracy
    var attempt = 0
    var stats: Option[Map[Long, Double]] = None
    while (stats.isEmpty && attempt < 4) {
      // bracket every wanted rank with sketch values at padded quantiles
      val sketchProbs = ranks.flatMap { k =>
        val p = k.toDouble / math.max(n - 1, 1)
        Seq(math.max(0.0, p - pad), math.min(1.0, p + pad))
      }
      val ap = vals.agg(expr(
        s"approx_percentile(__v, array(${sketchProbs.mkString(", ")}), $accuracy)"))
        .head().getSeq[Double](0)
      // per-rank bracket [lo, hi]; padded prob at the domain edge means
      // the true min/max IS the hard bound (the sketch only approximates
      // the extremes), then merge overlapping brackets
      val raw = ranks.zipWithIndex.map { case (k, i) =>
        val p = k.toDouble / math.max(n - 1, 1)
        val lo = if (p - pad <= 0) mn else ap(2 * i)
        val hi = if (p + pad >= 1) mx else ap(2 * i + 1)
        (math.min(lo, hi), math.max(lo, hi))
      }
      val brackets = raw.foldLeft(List.empty[(Double, Double)]) {
        case (acc0, (lo, hi)) => acc0 match {
          case (plo, phi) :: rest if lo <= phi => (plo, math.max(phi, hi)) :: rest
          case _ => (lo, hi) :: acc0
        }
      }.reverse
      // pass 2: below-count and in-count per bracket (one narrow scan)
      val cntAggs = brackets.zipWithIndex.flatMap { case ((lo, hi), i) =>
        Seq(sum(when(col("__v") < lo, 1L).otherwise(0L)).as(s"lt$i"),
          sum(when(col("__v") >= lo && col("__v") <= hi, 1L).otherwise(0L)).as(s"in$i"))
      }
      val cnts = vals.agg(cntAggs.head, cntAggs.tail: _*).head()
      val meta = brackets.indices.map(i =>
        (cnts.getAs[Long](s"lt$i"), cnts.getAs[Long](s"in$i")))
      val covered = ranks.forall(k => brackets.indices.exists { i =>
        k >= meta(i)._1 && k < meta(i)._1 + meta(i)._2 })
      val small = meta.forall(_._2 <= 4000000L)
      if (covered && small) {
        // pass 3: collect the bracket members, select exact order stats
        val colAggs = brackets.zipWithIndex.map { case ((lo, hi), i) =>
          sort_array(collect_list(when(col("__v") >= lo && col("__v") <= hi,
            col("__v")))).as(s"vs$i")
        }
        val vrow = vals.agg(colAggs.head, colAggs.tail: _*).head()
        val found = ranks.map { k =>
          val i = brackets.indices.find(i =>
            k >= meta(i)._1 && k < meta(i)._1 + meta(i)._2).get
          k -> vrow.getSeq[Double](vrow.fieldIndex(s"vs$i"))((k - meta(i)._1).toInt)
        }.toMap
        stats = Some(found)
      } else {
        pad = math.min(pad * 8, 0.5)
        attempt += 1
      }
    }
    val byRank = stats.getOrElse {
      // sketch never converged (pathological duplicates): one exact
      // percentile aggregate as the safety net
      val exactProbs = ranks.map(k => k.toDouble / math.max(n - 1, 1))
      val row = vals.agg(pctExpr("__v", exactProbs, exact = true)).head()
      ranks.zip(row.getSeq[Double](0)).toMap
    }
    positions.map { pos =>
      val lo = math.floor(pos).toLong
      val hi = math.ceil(pos).toLong
      if (hi == lo) byRank(lo)
      else (hi - pos) * byRank(lo) + (pos - lo) * byRank(hi)
    }
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
