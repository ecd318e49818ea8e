package graft.pipeline

import graft.functions.Stats
import graft.operators.MLOps
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-3 clustering (clustering.R): drop price → z-scale → elbow sweep →
  * k=3 fit → label join → cluster means → unscaled centers → per-feature
  * ANOVA validation. Cluster ids are 1-based like R's; the id→label
  * mapping is positional exactly as the reference hardcodes it
  * (clustering.R:139-142). Assignment parity with R is metric-level
  * (SURVEY §7 hard-part 5): same k, sizes/centers within tolerance up to
  * permutation.
  */
object CarClusteringPipeline {

  val labels: Seq[(Int, String)] = Seq(
    1 -> "Economy Cars", 2 -> "Performance Cars", 3 -> "Luxury Cars")

  /** VectorAssembler reads dotted names as struct paths — the R-style
    * "brand.audi" dummies must be underscore-sanitized for ML stages.
    * Case-insensitive collisions (brand.nissan / brand.Nissan, real typo
    * levels) get a "__n" suffix or Spark's resolver calls them ambiguous. */
  private def safeNames(df: DataFrame): DataFrame = {
    val seen = scala.collection.mutable.Map[String, Int]()
    val newNames = df.columns.map { c =>
      val base = c.replace(".", "_")
      val n = seen.getOrElse(base.toLowerCase, 0)
      seen(base.toLowerCase) = n + 1
      if (n == 0) base else s"${base}__$n"
    }
    df.toDF(newNames.toIndexedSeq: _*)
  }

  /** Elbow WSS curve over one cached scaled frame (clustering.R:36-42). */
  def elbow(mlReadyDf: DataFrame, ks: Seq[Int] = 1 to 15): DataFrame = {
    val safe = safeNames(mlReadyDf).drop("price")
    MLOps.elbow(safe, safe.columns.toSeq, ks)
  }

  /** Final clustering: returns (labeled frame, centers-in-original-scale).
    * Centers are unscaled via center + z*scale (clustering.R:85-87),
    * driver-side math on a k x d array. Output columns are the
    * underscore-sanitized feature names + cluster + label. */
  def cluster(mlReadyDf: DataFrame, k: Int = 3, seed: Long = 123L): (DataFrame, Seq[Seq[Double]]) = {
    val mlReady = safeNames(mlReadyDf)
    val featCols = mlReady.drop("price").columns.toSeq
    val (scaled, center, scale) = MLOps.standardize(mlReady, featCols)
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("scaled")
      .setPredictionCol("cluster0").fit(scaled)
    val assigned = model.transform(scaled)
      .withColumn("cluster", col("cluster0") + 1).drop("cluster0", "features", "scaled")
    val spark = mlReady.sparkSession
    import spark.implicits._
    val labelDf = labels.toDF("cluster", "label")
    val labeled = assigned.join(broadcast(labelDf), Seq("cluster"))
    val centersOrig = model.clusterCenters.toSeq.map(v =>
      v.toArray.toSeq.zipWithIndex.map { case (z, i) => center(i) + z * scale(i) })
    (labeled, centersOrig)
  }

  /** Cluster interpretation: per-cluster means of every feature
    * (clustering.R:132 aggregate(. ~ cluster, FUN = mean)). */
  def clusterMeans(labeled: DataFrame, cols: Seq[String]): DataFrame =
    labeled.groupBy("cluster")
      .agg(cols.map(c => avg(col(s"`$c`")).as(c)).head,
        cols.map(c => avg(col(s"`$c`")).as(c)).tail: _*)
      .orderBy("cluster")

  /** Per-feature ANOVA by cluster (clustering.R:210-218): does each
    * feature differ significantly across clusters? */
  def validateAnova(labeled: DataFrame, features: Seq[String]): DataFrame = {
    val spark = labeled.sparkSession
    import spark.implicits._
    features.map { f =>
      val r = Stats.anovaF(labeled, f, "cluster").head()
      (f, r.getAs[Double]("f_stat"), r.getAs[Double]("p_value"))
    }.toDF("feature", "f_stat", "p_value")
  }
}
