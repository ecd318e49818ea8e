package graft

import graft.pipeline.{CarClusteringPipeline, CarPricePipeline, CarRulesPipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Phase-3 (clustering.R) and Phase-4 (associationRules.R) pipelines.
  * K-means parity with R is metric-level (cluster count, sizes, ANOVA
  * significance) per SURVEY §7; binning and rule mining are exact.
  */
class CarPhasesSpec extends AnyFunSuite {
  lazy val spark = Tables.session(4)

  // cache at pipeline boundaries: the uncached plan (csv -> clean ->
  // dummies -> scale) recomputed through iterative KMeans churns enough
  // generated-code classes to OOM an 8g test JVM on 205 rows
  lazy val mlReady = {
    val df = CarPricePipeline.mlReady(CarPricePipeline.clean(
      CarPricePipeline.load(spark, "/root/reference/CarPrice_Assignment.csv"))).cache()
    df.count(); df
  }
  lazy val clustered: (org.apache.spark.sql.DataFrame, Seq[Seq[Double]]) = {
    val (labeled, centers) = CarClusteringPipeline.cluster(mlReady)
    val c = labeled.cache(); c.count()
    (c, centers)
  }

  test("clustering: k=3 on 34 features, labeled, centers in original scale") {
    val (labeled, centers) = clustered
    val sizes = labeled.groupBy("cluster").count().collect()
      .map(r => r.getAs[Int]("cluster") -> r.getLong(1)).toMap
    assert(sizes.keySet == Set(1, 2, 3))
    assert(sizes.values.sum == 205)
    assert(sizes.values.forall(_ > 0))
    assert(centers.length == 3 && centers.forall(_.length == 34))
    // centers unscaled back to original units: horsepower means must be
    // inside the observed (winsorized) range
    val hp = centers.map(_.head)
    assert(hp.forall(h => h > 50 && h < 210), s"unscaled hp centers: $hp")
    val labels = labeled.select("label").distinct().collect().map(_.getString(0)).toSet
    assert(labels == Set("Economy Cars", "Performance Cars", "Luxury Cars"))
  }

  test("clustering: elbow WSS decreases with k") {
    val wss = CarClusteringPipeline.elbow(mlReady, Seq(1, 2, 3, 5, 8))
      .orderBy("k").collect().map(_.getDouble(1))
    assert(wss.zip(wss.tail).forall { case (a, b) => b <= a + 1e-6 })
  }

  test("clustering: per-feature ANOVA finds significant separation") {
    val (labeled, _) = clustered
    val anova = CarClusteringPipeline.validateAnova(labeled,
      Seq("horsepower", "curbweight", "price"))
    // clusters exist in feature space, so features must separate strongly
    anova.collect().foreach { r =>
      assert(r.getAs[Double]("p_value") < 0.01,
        s"${r.getString(0)} not separated: p=${r.getAs[Double]("p_value")}")
    }
  }

  test("phase-4 binning matches R cut() on known rows incl. out-of-range curbweight") {
    val (labeled, _) = clustered
    val binned = CarRulesPipeline.binned(labeled)
    // curbweight 4066 exceeds the 4000 top break -> NULL bin (real data)
    assert(binned.filter(col("curbweight") > 4000 && col("weight_cat").isNotNull).count() == 0)
    assert(binned.filter(col("weight_cat").isNull && col("curbweight") <= 4000).count() == 0)
    // boundary: horsepower exactly 100 -> Low_HP under (a,b] semantics
    val hp100 = binned.filter(col("horsepower") === 100).select("horsepower_cat")
      .distinct().collect().map(_.getString(0))
    assert(hp100.isEmpty || hp100.sameElements(Array("Low_HP")))
  }

  test("phase-4 brand recovery inverts the one-hot matrix") {
    val rec = CarRulesPipeline.recoverBrand(mlReady)
    // dropped first level (alfa-romero) has all-zero dummies -> Unknown
    val unknown = rec.filter(col("brand") === "Unknown").count()
    assert(unknown == 3) // 3 alfa-romero cars in the raw data
    assert(rec.filter(col("brand") === "toyota").count() > 20)
  }

  test("phase-4 mining at supp=.1/conf=.7/len 2-4 yields pruned non-empty rules") {
    val (labeled, _) = clustered
    val withBrand = CarRulesPipeline.recoverBrand(CarRulesPipeline.binned(labeled))
    val tx = CarRulesPipeline.transactions(withBrand)
    val rules = CarRulesPipeline.mineRules(tx).cache()
    assert(rules.count() > 0)
    val sizes = rules.select((size(col("antecedent")) + size(col("consequent"))).as("len"))
      .agg(min("len"), max("len")).head()
    assert(sizes.getInt(0) >= 2 && sizes.getInt(1) <= 4)
    assert(rules.filter(col("confidence") < 0.7).count() == 0)
    // per-cluster re-mining produces segmented rules
    val perCluster = CarRulesPipeline.perClusterRules(withBrand)
    assert(perCluster.select("segment").distinct().count() == 3)
  }
}
