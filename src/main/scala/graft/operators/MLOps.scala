package graft.operators

import org.apache.spark.ml.classification.NaiveBayes
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{PCA, StandardScaler, VectorAssembler}
import org.apache.spark.ml.regression.{DecisionTreeRegressionModel, DecisionTreeRegressor, LinearRegression, RandomForestRegressor}
import org.apache.spark.ml.tuning.{ParamGridBuilder, TrainValidationSplit}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** ML operators mirroring the reference models (SURVEY.md §2.10) on
  * org.apache.spark.ml. RNG-dependent parity is metric-level, never
  * row-level (SURVEY §7 hard-part 5): fixed seeds make each op
  * deterministic per dataset, but cluster ids / tree structure differ from
  * R's — tests compare sizes/costs/metrics within tolerance.
  */
object MLOps {

  def assemble(df: DataFrame, cols: Seq[String], out: String = "features"): DataFrame =
    new VectorAssembler().setInputCols(cols.toArray).setOutputCol(out)
      .setHandleInvalid("skip").transform(df)

  /** A12: z-score standardization (sample sd, mean-centered — same as R
    * scale()). Returns the transformed frame plus (center, scale). */
  def standardize(df: DataFrame, cols: Seq[String],
                  out: String = "scaled"): (DataFrame, Array[Double], Array[Double]) = {
    val assembled = assemble(df, cols)
    val scaler = new StandardScaler().setWithMean(true).setWithStd(true)
      .setInputCol("features").setOutputCol(out)
    val model = scaler.fit(assembled)
    (model.transform(assembled), model.mean.toArray, model.std.toArray)
  }

  /** M9: k-means (k-means|| init, fixed seed) on standardized features.
    * Returns (assigned frame, total within-cluster SS = trainingCost). */
  def kmeans(df: DataFrame, cols: Seq[String], k: Int, seed: Long = 123L,
             standardizeFirst: Boolean = true): (DataFrame, Double) = {
    val (prepped, featCol) =
      if (standardizeFirst) (standardize(df, cols)._1, "scaled")
      else (assemble(df, cols), "features")
    val km = new KMeans().setK(k).setSeed(seed).setFeaturesCol(featCol)
      .setPredictionCol("cluster")
    val model = km.fit(prepped)
    (model.transform(prepped), model.summary.trainingCost)
  }

  /** M9: elbow sweep — one cached standardized frame, |ks| * restarts fits.
    * Defaults (1 restart, 8 iterations) give the WSS(k) SHAPE cheaply —
    * the right trade at scale, where every extra iteration is a full data
    * pass, but the resulting curve can be locally non-monotone (a sloppy
    * fit at k+1 may land above k's). Parity with R's `nstart = 10`
    * converged sweep (clustering.R:36-42) needs restarts ≈ 10 and a high
    * maxIter; CarClusteringPipeline.elbow opts into that. */
  def elbow(df: DataFrame, cols: Seq[String], ks: Seq[Int],
            seed: Long = 123L, restarts: Int = 1, maxIter: Int = 8): DataFrame = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import graft.operators.FitPool.ec
    val spark = df.sparkSession
    val (prepped, _, _) = standardize(df, cols)
    val cached = prepped.cache()
    cached.count() // materialize once before concurrent fits share it
    try {
      // every (k, restart) fit is an independent Spark job over the same
      // cached frame — submit them concurrently on the BOUNDED FitPool and
      // let the scheduler interleave stages. On a sweep this turns
      // sum-of-fits wall time into ~max-of-fits (each tiny fit
      // underutilizes the cluster; the reference's own loop is serial),
      // while the in-flight cap keeps a huge ks×restarts grid from
      // occupying one blocked thread per fit. Results are
      // seed-deterministic and order-independent.
      val futs = ks.map {
        case 1 => FitPool.submit {
          // Spark KMeans requires k >= 2; WSS(1) is the total sum of
          // squares about the mean, computed directly (R kmeans allows 1)
          val Row(vars: org.apache.spark.ml.linalg.Vector, n: Long) = cached.select(
            org.apache.spark.ml.stat.Summarizer.variance(col("scaled")),
            count(lit(1))).head()
          (1, vars.toArray.sum * (n - 1))
        }
        case k => Future.sequence((0 until restarts).map { i => FitPool.submit {
            // random init for the sweep: the elbow needs the WSS(k) shape,
            // not each fit's global optimum, and k-means|| init is several
            // extra data passes per k; capped iterations for the same
            // reason. The final model fit (kmeans()) keeps k-means||.
            new KMeans().setK(k).setSeed(seed + i).setInitMode("random")
              .setMaxIter(maxIter).setFeaturesCol("scaled").fit(cached)
              .summary.trainingCost
          } }).map(costs => (k, costs.min))
      }
      val rows = Await.result(Future.sequence(futs), Duration.Inf)
      import spark.implicits._
      rows.toDF("k", "wss")
    } finally cached.unpersist()
  }

  /** M11: PCA on standardized features; returns per-component explained
    * variance ratios (prcomp importance analog). */
  def pcaExplainedVariance(df: DataFrame, cols: Seq[String], k: Int): Seq[Double] = {
    val (prepped, _, _) = standardize(df, cols)
    val model = new PCA().setK(k).setInputCol("scaled").setOutputCol("pcs").fit(prepped)
    model.explainedVariance.toArray.toSeq
  }

  /** M3: OLS (normal-equation solver — exact, deterministic, gives
    * t-stats/p-values like summary(lm)). */
  def ols(df: DataFrame, featureCols: Seq[String], labelCol: String): DataFrame = {
    val spark = df.sparkSession
    val lr = new LinearRegression().setSolver("normal").setRegParam(0.0)
      .setFeaturesCol("features").setLabelCol(labelCol)
    val model = lr.fit(assemble(df, featureCols))
    val s = model.summary
    import spark.implicits._
    val rows = ("(intercept)", model.intercept,
      s.coefficientStandardErrors.last, s.tValues.last, s.pValues.last) +:
      featureCols.zipWithIndex.map { case (c, i) =>
        (c, model.coefficients(i), s.coefficientStandardErrors(i), s.tValues(i), s.pValues(i))
      }
    rows.toDF("term", "estimate", "std_error", "t_value", "p_value")
  }

  /** M4: caret::postResample-style metrics — RMSE, R^2 = squared Pearson
    * corr (caret's definition, NOT 1-SSE/SST), MAE; optional expm1
    * back-transform of both columns (log-price models). */
  def regressionMetrics(df: DataFrame, predCol: String, labelCol: String,
                        expm1Back: Boolean = false): (Double, Double, Double) = {
    val (p, l) =
      if (expm1Back) (expm1(col(predCol)), expm1(col(labelCol)))
      else (col(predCol), col(labelCol))
    val row = df.select(
      sqrt(avg(pow(p - l, 2))).as("rmse"),
      pow(corr(p, l), 2).as("r2"),
      avg(abs(p - l)).as("mae")).head()
    (row.getDouble(0), row.getDouble(1), row.getDouble(2))
  }

  /** M5: CART-analog regression tree (histogram splits; structure differs
    * from rpart — parity is metric-level). */
  def decisionTree(df: DataFrame, featureCols: Seq[String], labelCol: String,
                   maxDepth: Int = 5, seed: Long = 123L): DataFrame = {
    val (model, assembled) = decisionTreeFit(df, featureCols, labelCol, maxDepth, seed)
    model.transform(assembled)
  }

  /** M5 model-level form: returns (fitted tree, assembled input) so
    * callers can inspect structure invariants (depth, numNodes) and
    * exercise S4 save/load parity (q100). */
  def decisionTreeFit(df: DataFrame, featureCols: Seq[String], labelCol: String,
                      maxDepth: Int = 5, seed: Long = 123L): (DecisionTreeRegressionModel, DataFrame) = {
    val dt = new DecisionTreeRegressor().setMaxDepth(maxDepth).setSeed(seed)
      .setFeaturesCol("features").setLabelCol(labelCol).setPredictionCol("prediction")
    val assembled = assemble(df, featureCols)
    (dt.fit(assembled), assembled)
  }

  /** M6: random forest + feature importances. */
  def randomForestImportances(df: DataFrame, featureCols: Seq[String], labelCol: String,
                              numTrees: Int = 200, seed: Long = 123L): DataFrame = {
    val spark = df.sparkSession
    val rf = new RandomForestRegressor().setNumTrees(numTrees).setSeed(seed)
      .setFeaturesCol("features").setLabelCol(labelCol)
    val model = rf.fit(assemble(df, featureCols))
    import spark.implicits._
    featureCols.zip(model.featureImportances.toArray)
      .toDF("feature", "importance")
  }

  /** M7: Gaussian naive Bayes (documented deviation from e1071's
    * kernel-density NB — SURVEY §7 hard-part 6). */
  def naiveBayesGaussian(df: DataFrame, featureCols: Seq[String],
                         labelCol: String): DataFrame = {
    val nb = new NaiveBayes().setModelType("gaussian")
      .setFeaturesCol("features").setLabelCol(labelCol)
    val assembled = assemble(df, featureCols)
    nb.fit(assembled).transform(assembled)
  }

  /** M8: RBF-SVR stand-in — random Fourier features (seeded Gaussian
    * projections approximating the RBF kernel) + linear regression, with
    * the cost/gamma grid mapped to a regParam/gamma grid searched by
    * TrainValidationSplit (caret::tune analog). */
  def rffRegression(df: DataFrame, featureCols: Seq[String], labelCol: String,
                    numFeatures: Int = 64, gamma: Double = 0.1,
                    seed: Long = 123L): DataFrame = {
    val rng = new java.util.Random(seed)
    val d = featureCols.length
    val w = Array.fill(numFeatures, d)(rng.nextGaussian() * math.sqrt(2 * gamma))
    val b = Array.fill(numFeatures)(rng.nextDouble() * 2 * math.Pi)
    val assembled = assemble(df, featureCols)
    // z_i(x) = sqrt(2/D) * cos(w_i . x + b_i), as a column expression per i
    val zCols = (0 until numFeatures).map { i =>
      val dotExpr = featureCols.zipWithIndex
        .map { case (c, j) => col(c) * lit(w(i)(j)) }.reduce(_ + _)
      (cos(dotExpr + lit(b(i))) * lit(math.sqrt(2.0 / numFeatures))).as(s"z$i")
    }
    val rff = assembled.select((col(labelCol) +: zCols): _*)
    val lr = new LinearRegression().setFeaturesCol("rff").setLabelCol(labelCol)
    val zAssembled = new VectorAssembler()
      .setInputCols((0 until numFeatures).map(i => s"z$i").toArray)
      .setOutputCol("rff").transform(rff)
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.01, 0.1, 1.0)).build()
    val tvs = new TrainValidationSplit().setEstimator(lr)
      .setEvaluator(new RegressionEvaluator().setLabelCol(labelCol))
      .setEstimatorParamMaps(grid).setTrainRatio(0.8).setSeed(seed)
    tvs.fit(zAssembled).transform(zAssembled)
      .select(col(labelCol), col("prediction"))
  }

  /** M1: full-rank one-hot encoding with R's dummyVars column naming and
    * level order (case-insensitive sort, lowercase before uppercase on
    * ties — R's locale collation; first level dropped). Generated as
    * explicit when() columns so the output matches the golden CSV. */
  def oneHotFullRank(df: DataFrame, c: String): DataFrame = {
    val levels = rLevels(df, c)
    // single select with aliases: withColumn would resolve existing names
    // case-insensitively and silently REPLACE "brand.nissan" when adding
    // "brand.Nissan" (both exist in the reference's brand typos)
    df.select(col("*") +: levels.drop(1).map(v =>
      when(col(c) === v, 1).otherwise(0).as(s"$c.$v")): _*)
  }

  /** R factor level order: case-insensitive alphabetical, ties broken
    * lowercase-first (observed in the reference's golden headers:
    * "nissan" before "Nissan"). */
  def rLevels(df: DataFrame, c: String, maxLevels: Int = 1024): Seq[String] = {
    // cardinality guard (the requirePairBudget discipline): the collect
    // is bounded by maxLevels+1 rows, and a high-cardinality column
    // refuses loudly naming the scale twin instead of silently exploding
    // the schema with one dummy column per level
    val lv = df.select(c).distinct().limit(maxLevels + 1)
      .collect().map(_.getString(0)).toSeq
    require(lv.length <= maxLevels,
      s"rLevels('$c'): more than $maxLevels distinct levels — full-rank " +
        "one-hot at this cardinality explodes the schema; use " +
        "TextAnalysis.hashedLinearScore's hashing-trick encoding (q91) " +
        "or raise maxLevels")
    lv.sortBy(s => (s.toLowerCase,
      // case-inverted tiebreak so lowercase sorts before uppercase
      s.map(ch => if (ch.isLower) ch.toUpper else if (ch.isUpper) ch.toLower else ch)))
  }

  /** M2: stratified sampling on outcome quartiles (createDataPartition
    * analog) — deterministic for a fixed seed; `idCol` must be unique. */
  def stratifiedSplit(df: DataFrame, idCol: String, outcomeCol: String,
                      frac: Double, seed: Long = 123L,
                      maxStrata: Int = 64): (DataFrame, DataFrame) = {
    val bucketed = Cleaning.quantileBucket(df, outcomeCol, "__stratum")
    // quantile bucketing produces a handful of strata by construction;
    // the guard makes that contract explicit (bounded collect, loud
    // refusal) for callers who swap in their own stratum column
    val strata = bucketed.select("__stratum").distinct().limit(maxStrata + 1)
      .collect().map(_.getString(0))
    require(strata.length <= maxStrata,
      s"stratifiedSplit: more than $maxStrata distinct strata over " +
        s"'$outcomeCol' — sampleBy's fraction map is driver-side; use a " +
        "hash-bucket stratifier for high-cardinality outcomes or raise " +
        "maxStrata")
    val fractions = strata.map(_ -> frac).toMap
    val train = bucketed.stat.sampleBy("__stratum", fractions, seed)
    val test = bucketed.join(train.select(idCol), Seq(idCol), "left_anti")
    (train.drop("__stratum"), test.drop("__stratum"))
  }
}
