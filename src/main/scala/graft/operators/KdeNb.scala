package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M7 — kernel-density naive Bayes, the klaR-semantics variant.
  *
  * Reference note (BigDataProject.R:351-365): the script calls
  * `naiveBayes(price_bucket ~ ., data = nb_train, usekernel = TRUE)` with
  * ONLY e1071 loaded (library list at BigDataProject.R:20-34 — no klaR).
  * `e1071::naiveBayes` has no `usekernel` parameter; the flag lands in
  * `...` and is silently ignored, so the reference actually fits a
  * GAUSSIAN NB. [[MLOps.naiveBayesGaussian]] is therefore the exact
  * reference behavior, not a deviation. This operator supplies the
  * semantics the flag was *asking* for — klaR's `NaiveBayes(usekernel =
  * TRUE)` — so a user who fixes the reference's library bug can still
  * switch engines without a semantic change.
  *
  * Fit semantics follow the public R definitions:
  *  - per (class, feature) bandwidth = `bw.nrd0` (Silverman):
  *    `0.9 * min(sd, IQR/1.34) * n^(-1/5)`, with R's degenerate-spread
  *    fallback chain (min==0 → sd → |x₁| → 1; when sd==0 all values are
  *    equal, so |x₁| == |mean| and the distributed form stays exact);
  *  - density on a `gridN`-point uniform grid over
  *    `[min - cut*bw, max + cut*bw]` (stats::density defaults gridN=512,
  *    cut=3 for the Gaussian kernel): linear binning of the data onto the
  *    grid, then exact Gaussian-kernel convolution of the binned mass
  *    (R runs the same convolution via FFT — identical up to fp error);
  *  - predict interpolates the grid linearly at the test value (klaR's
  *    `dkernel`/`approx`), takes 0 outside the grid, floors each
  *    class-conditional density at `threshold` (klaR predict default
  *    0.001), and scores `log prior + Σ_f log(max(dens, threshold))`;
  *    NULL features contribute nothing (e1071/klaR skip NA attributes).
  *
  * Scale shape: one grouped aggregation for per-(class,feature)
  * sufficient stats, one `#classes`-bounded exact-IQR pass through
  * [[Cleaning.bracketQuantiles]] (or a single grouped approx_percentile
  * pass with `exactBandwidth = false` for wide class spaces), one linear
  * binning shuffle whose key space is classes × features × gridN (map-side
  * partial agg collapses it), and an O(gridN²) driver-side convolution per
  * (class, feature). Scoring is a single codegen'd projection over
  * grid-literal arrays — no join, no shuffle, no UDF.
  */
object KdeNb {

  /** One fitted class-conditional density: `ys(j)` is the density at grid
    * point `lo + j*dx`, `dx = (hi-lo)/(gridN-1)`. */
  final case class ClassDensity(label: String, feature: String, n: Long,
                                bw: Double, lo: Double, hi: Double,
                                ys: Array[Double])

  final case class Model(classes: Seq[String], counts: Map[String, Long],
                         features: Seq[String], densities: Seq[ClassDensity],
                         gridN: Int, threshold: Double) {
    def prior(c: String): Double = counts(c).toDouble / counts.values.sum
    def density(c: String, f: String): ClassDensity =
      densities.find(d => d.label == c && d.feature == f).getOrElse(
        throw new NoSuchElementException(s"no density for ($c, $f)"))
  }

  /** R's `bw.nrd0` with its full fallback chain; `absX1` stands in for
    * `|x[1]|` (only consulted when sd == 0, where all values are equal
    * and any |xᵢ| — in particular |mean| — equals |x₁|). */
  def bwNrd0(n: Long, sd: Double, iqr: Double, absX1: Double): Double = {
    val sd0 = if (sd.isNaN) 0.0 else sd
    val lo0 = math.min(sd0, iqr / 1.34)
    val lo = if (lo0 > 0) lo0 else if (sd0 > 0) sd0
             else if (absX1 > 0) absX1 else 1.0
    0.9 * lo * math.pow(n.toDouble, -0.2)
  }

  def fit(df: DataFrame, featureCols: Seq[String], labelCol: String,
          gridN: Int = 512, cut: Double = 3.0, threshold: Double = 1e-3,
          maxClasses: Int = 64, exactBandwidth: Boolean = true,
          maxGridTuples: Long = 2000000L): Model = {
    require(featureCols.nonEmpty && featureCols.size <= 64,
      s"KdeNb.fit: ${featureCols.size} features — the grid collect is " +
        "bounded by classes*features*gridN; keep features <= 64")
    val lab = col(labelCol).cast("string")
    // spread before the fit passes (round 17; guide §2.6): every pass —
    // grouped stats, the 3 bracket-quantile scans, the linear-binning
    // explode+agg — inherits the source width, and a single-file scan
    // arrives in 1-2 partitions, so the whole fit ran as 2 tasks on 32
    // cores (q106 profile: one 2-task job holding 4.0 task-seconds).
    // Key = the full row struct (deterministic, high-cardinality; the
    // class column alone would hash #classes values into 32 partitions
    // — guide §2.5). All downstream consumers are aggregates, so the
    // row set (and every exact bracket count) is unchanged.
    val base = Staging.spread(
      df.select((lab.as("__cls") +:
        featureCols.map(c => col(s"`$c`").cast("double").as(c))): _*)
        .filter(col("__cls").isNotNull),
      struct(col("__cls") +: featureCols.map(c => col(s"`$c`")): _*)).cache()
    try {
      // classes: bounded collect with the rLevels/requirePairBudget guard
      val clsRows = base.select("__cls").distinct().limit(maxClasses + 1)
        .collect().map(_.getString(0)).toSeq
      require(clsRows.size <= maxClasses,
        s"KdeNb.fit: more than $maxClasses classes in '$labelCol' — " +
          "per-class density grids are driver-resident; raise maxClasses " +
          "only if classes*features*gridN stays driver-sized")
      val classes = clsRows.sorted // R factor order: sorted levels
      // computed driver-size budget (the requirePairBudget discipline):
      // the binned-mass collect and the model itself are
      // classes*features*gridN grid tuples — refuse LOUDLY before any
      // distributed work is scheduled, naming the knobs, instead of
      // OOMing the driver on a wide class space
      val gridTuples = classes.size.toLong * featureCols.size * gridN
      require(gridTuples <= maxGridTuples,
        s"KdeNb.fit: ${classes.size} classes x ${featureCols.size} features " +
          s"x gridN=$gridN = $gridTuples driver-resident grid tuples exceeds " +
          s"budget $maxGridTuples. Reduce gridN, fit fewer features/classes " +
          "per model (and prefer exactBandwidth=false on wide class spaces " +
          "- one grouped pass instead of per-class scans), or raise " +
          "maxGridTuples on a driver with the heap to hold it.")
      // one grouped pass: n / mean / sd / min / max per (class, feature)
      val aggs = (count(lit(1)).as("n__all") +: featureCols.flatMap { c => Seq(
        count(col(s"`$c`")).as(s"n__$c"), avg(col(s"`$c`")).as(s"m__$c"),
        stddev_samp(col(s"`$c`")).as(s"sd__$c"),
        min(col(s"`$c`")).as(s"mn__$c"), max(col(s"`$c`")).as(s"mx__$c"))
      }) ++ (if (exactBandwidth) Nil else featureCols.map { c =>
        expr(s"approx_percentile(`$c`, array(0.25, 0.75), 10000)").as(s"q__$c")
      })
      val statRows = base.groupBy(col("__cls")).agg(aggs.head, aggs.tail: _*)
        .collect().map(r => r.getString(0) -> r).toMap
      // exact type-7 IQR (== R quantile == DuckDB quantile_cont): ONE
      // grouped bracket-quantile pass for ALL classes (round 16 — the
      // per-class form paid classes x 3 corpus scans; the grouped twin
      // pays 3 total, value-identical per class, CleaningSpec-pinned)
      val iqrOf: Map[(String, String), Double] =
        if (exactBandwidth) {
          val qs = Cleaning.bracketQuantilesByGroup(
            base, "__cls", featureCols, Seq(0.25, 0.75))
          (for (c <- classes; f <- featureCols)
            yield (c, f) -> (qs((c, f))(1) - qs((c, f))(0))).toMap
        }
        else classes.flatMap { c => featureCols.map { f =>
          val q = statRows(c).getSeq[Double](statRows(c).fieldIndex(s"q__$f"))
          (c, f) -> (q(1) - q(0))
        }}.toMap
      val counts = classes.map(c => c -> statRows(c).getAs[Long]("n__all")).toMap
      val wins = for (c <- classes; f <- featureCols) yield {
        val r = statRows(c)
        val n = r.getAs[Long](s"n__$f")
        val sd = Option(r.getAs[Any](s"sd__$f")).fold(0.0)(_.asInstanceOf[Double])
        val m = Option(r.getAs[Any](s"m__$f")).fold(0.0)(_.asInstanceOf[Double])
        val bw = bwNrd0(math.max(n, 1), sd, iqrOf((c, f)), math.abs(m))
        val mn = Option(r.getAs[Any](s"mn__$f")).fold(0.0)(_.asInstanceOf[Double])
        val mx = Option(r.getAs[Any](s"mx__$f")).fold(0.0)(_.asInstanceOf[Double])
        Win(c, f, n, bw, mn - cut * bw, mx + cut * bw)
      }
      // linear binning: tall (class, feature, x) frame -> mass on the two
      // neighboring grid points -> tiny-key hash agg (partials collapse
      // the key space map-side, so the shuffle moves ~classes*features*
      // gridN rows regardless of input size)
      val tall = featureCols.map { f =>
        base.select(col("__cls"), lit(f).as("__f"),
          col(s"`$f`").as("__x")).filter(col("__x").isNotNull)
      }.reduce(_ unionAll _)
      val loC = winCase(wins, _.lo); val dxC = winCase(wins,
        w => (w.hi - w.lo) / (gridN - 1))
      val t = (col("__x") - loC) / dxC
      val j = least(floor(t), lit((gridN - 2).toDouble))
      val fr = t - j
      val mass = tall.select(col("__cls"), col("__f"),
          explode(array(
            struct(j.cast("int").as("__j"), (lit(1.0) - fr).as("__m")),
            struct((j + 1).cast("int").as("__j"), fr.as("__m")))).as("b"))
        .select(col("__cls"), col("__f"), col("b.__j"), col("b.__m"))
        .groupBy("__cls", "__f", "__j").agg(sum("__m").as("__mass"))
        .collect().map(r => ((r.getString(0), r.getString(1), r.getInt(2)),
          r.getDouble(3))).toMap
      // exact Gaussian convolution of the binned mass (R: same via FFT)
      val densities = wins.map { w =>
        val dx = (w.hi - w.lo) / (gridN - 1)
        val kern = Array.tabulate(gridN) { m =>
          val z = m * dx / w.bw
          math.exp(-0.5 * z * z) / (math.sqrt(2 * math.Pi) * w.bw)
        }
        val ms = Array.tabulate(gridN)(k =>
          mass.getOrElse((w.cls, w.f, k), 0.0))
        val ys = Array.tabulate(gridN) { g =>
          var s = 0.0; var k = 0
          while (k < gridN) { s += ms(k) * kern(math.abs(g - k)); k += 1 }
          s / w.n
        }
        ClassDensity(w.cls, w.f, w.n, w.bw, w.lo, w.hi, ys)
      }
      Model(classes, counts, featureCols, densities, gridN, threshold)
    } finally base.unpersist()
  }

  private final case class Win(cls: String, f: String, n: Long, bw: Double,
                               lo: Double, hi: Double)

  private def winCase(wins: Seq[Win], v: Win => Double): org.apache.spark.sql.Column =
    wins.tail.foldLeft(
      when(col("__cls") === wins.head.cls && col("__f") === wins.head.f,
        lit(v(wins.head)))) { (acc, w) =>
      acc.when(col("__cls") === w.cls && col("__f") === w.f, lit(v(w)))
    }

  /** Grid interpolation at `x` for one fitted density, as a pure codegen
    * expression over a literal grid array (no join, no UDF). */
  private def interp(d: ClassDensity, x: org.apache.spark.sql.Column,
                     gridN: Int): org.apache.spark.sql.Column = {
    val dx = (d.hi - d.lo) / (gridN - 1)
    val t = (x - lit(d.lo)) / lit(dx)
    val j = least(floor(t), lit((gridN - 2).toDouble))
    val fr = t - j
    val ysLit = typedlit[Seq[Double]](d.ys.toSeq)
    val y = element_at(ysLit, j.cast("int") + 1) * (lit(1.0) - fr) +
      element_at(ysLit, j.cast("int") + 2) * fr
    when(x.isNull, lit(null)).when(t < 0 || t > (gridN - 1), lit(0.0)).otherwise(y)
  }

  /** Adds `logp_<i>` (joint log-score per class, in `model.classes`
    * order), `posterior_<i>` (softmax-normalized), and `pred` (argmax
    * label, first class wins ties — R `which.max`). One projection. */
  def score(df: DataFrame, model: Model): DataFrame = {
    // spread before the scoring projection (round 17; guide §2.6): the
    // per-row expression is classes x features grid interpolations plus
    // the posterior/argmax chain — heavy enough that a 1-partition scan
    // made q106's scoring a single 2.2 s task on 32 cores. No-op on
    // streams (EventStream's gate) and at production scan widths; pure
    // projection downstream, so row values are untouched.
    val dfW = Staging.spread(df,
      struct(model.features.map(f => col(s"`$f`")): _*))
    val logps = model.classes.zipWithIndex.map { case (c, i) =>
      val terms = model.features.map { f =>
        val d = model.density(c, f)
        val x = col(s"`$f`").cast("double")
        // NULL feature -> no contribution (e1071/klaR skip NA attributes)
        when(x.isNull, lit(0.0)).otherwise(
          log(greatest(interp(d, x, model.gridN), lit(model.threshold))))
      }
      terms.foldLeft(lit(math.log(model.prior(c))))(_ + _).as(s"logp_$i")
    }
    val scored = dfW.select(col("*") +: logps: _*)
    if (model.classes.size == 1)
      return scored.withColumn("posterior_0", lit(1.0))
        .withColumn("pred", lit(model.classes.head))
    val mx = greatest(model.classes.indices.map(i => col(s"logp_$i")): _*)
    val sumExp = model.classes.indices
      .map(i => exp(col(s"logp_$i") - mx)).reduce(_ + _)
    val withPost = scored.select(col("*") +:
      model.classes.indices.map(i =>
        (exp(col(s"logp_$i") - mx) / sumExp).as(s"posterior_$i")): _*)
    // first-max argmax (R which.max): branch i fires iff logp_i >= every
    // later logp and no earlier branch fired — yields the first index of
    // the maximum
    val pred = model.classes.zipWithIndex.tail.foldLeft(
      when(model.classes.indices.tail.map(i =>
        col("logp_0") >= col(s"logp_$i")).reduce(_ && _), model.classes.head)) {
      case (acc, (c, i)) =>
        acc.when(model.classes.indices.drop(i + 1).map(k =>
          col(s"logp_$i") >= col(s"logp_$k")).foldLeft(lit(true))(_ && _), c)
    }
    withPost.withColumn("pred", pred)
  }

  /** S4-family persistence: the model as one parquet frame (one row per
    * class-feature density, grid as an array column; counts/threshold/
    * gridN replicated — tiny frame, exact round-trip). */
  def saveModel(model: Model, path: String)(implicit spark: SparkSession): Unit = {
    import spark.implicits._
    model.densities.map { d =>
      (d.label, d.feature, d.n, d.bw, d.lo, d.hi, d.ys.toSeq,
        model.counts(d.label), model.gridN, model.threshold,
        model.features.indexOf(d.feature))
    }.toDF("label", "feature", "n", "bw", "lo", "hi", "ys",
      "class_count", "grid_n", "threshold", "feature_idx")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadModel(spark: SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path).collect()
    val densities = rows.map(r => ClassDensity(r.getAs[String]("label"),
      r.getAs[String]("feature"), r.getAs[Long]("n"), r.getAs[Double]("bw"),
      r.getAs[Double]("lo"), r.getAs[Double]("hi"),
      r.getSeq[Double](r.fieldIndex("ys")).toArray)).toSeq
    val counts = rows.map(r =>
      r.getAs[String]("label") -> r.getAs[Long]("class_count")).toMap
    val features = rows.map(r => (r.getAs[Int]("feature_idx"),
      r.getAs[String]("feature"))).distinct.sortBy(_._1).map(_._2).toSeq
    Model(counts.keys.toSeq.sorted, counts, features, densities,
      rows.head.getAs[Int]("grid_n"), rows.head.getAs[Double]("threshold"))
  }
}
