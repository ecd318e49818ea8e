package graft.pipeline

import graft.operators.{Cleaning, Rules}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Phase-4 association rules (associationRules.R): fixed-break binning of
  * five measures with R cut() semantics, brand recovery from the one-hot
  * matrix, transactions over 7 categorical columns, Apriori-equivalent
  * mining (FPGrowth) at supp=.1/conf=.7/len 2-4, redundancy pruning,
  * interest measures, and per-cluster re-mining.
  */
object CarRulesPipeline {

  /** The five binnings (associationRules.R:24-51). Out-of-range values →
    * null, exactly like R (curbweight 4066 > 4000 is real data). */
  def binned(carData: DataFrame): DataFrame = carData
    .withColumn("horsepower_cat", Cleaning.cutLabels(col("horsepower"),
      Seq(0, 100, 150, 200, 250), Seq("Low_HP", "Medium_HP", "High_HP", "VeryHigh_HP")))
    .withColumn("enginesize_cat", Cleaning.cutLabels(col("enginesize"),
      Seq(0, 100, 150, 200, 300, 400),
      Seq("Small_Engine", "Medium_Engine", "Large_Engine", "VLarge_Engine", "XLarge_Engine")))
    .withColumn("price_cat", Cleaning.cutLabels(col("price"),
      Seq(0, 10000, 20000, 30000, 50000), Seq("Budget", "MidRange", "Premium", "Luxury")))
    .withColumn("mpg_cat", Cleaning.cutLabels(col("citympg"),
      Seq(0, 20, 25, 30, 50), Seq("Low_MPG", "Medium_MPG", "High_MPG", "VeryHigh_MPG")))
    .withColumn("weight_cat", Cleaning.cutLabels(col("curbweight"),
      Seq(0, 2000, 2500, 3000, 4000), Seq("Light", "Medium", "Heavy", "VeryHeavy")))

  /** Brand recovery from one-hot columns (associationRules.R:54-66):
    * first dummy = 1 wins (column order), else "Unknown". A coalesce/when
    * chain — the reference's row loop needs no UDF in Spark. Accepts both
    * "brand.x" (R-style) and "brand_x" (ML-sanitized) dummy names. */
  def recoverBrand(df: DataFrame): DataFrame = {
    // positional rename first: name-based references to "brand.nissan"
    // are AMBIGUOUS against "brand.Nissan" under the case-insensitive
    // resolver (both are real levels). toDF bypasses resolution entirely.
    val seen = scala.collection.mutable.Map[String, Int]()
    val unique = df.columns.map { c =>
      val base = c.replace(".", "_")
      val n = seen.getOrElse(base.toLowerCase, 0)
      seen(base.toLowerCase) = n + 1
      if (n == 0) base else s"${base}__$n"
    }
    val renamed = df.toDF(unique.toIndexedSeq: _*)
    val brandCols = renamed.columns.filter(_.startsWith("brand_")).toSeq
    val chain = brandCols.map(c =>
      when(col(s"`$c`") === 1,
        lit(c.drop("brand_".length).replaceAll("__\\d+$", ""))))
    renamed.withColumn("brand", coalesce(chain :+ lit("Unknown"): _*))
  }

  val transactionCols: Seq[String] = Seq("horsepower_cat", "enginesize_cat",
    "price_cat", "mpg_cat", "weight_cat", "brand", "label")

  /** Transactions = array of "col=value" items over the 7 categorical
    * columns; null bins are dropped from the basket (arules drops NA). */
  def transactions(df: DataFrame): DataFrame = {
    val items = transactionCols.map(c =>
      when(col(s"`$c`").isNotNull, concat_ws("=", lit(c), col(s"`$c`"))))
    df.withColumn("items",
      filter(array(items: _*), x => x.isNotNull))
  }

  /** Full phase-4 mining at the reference thresholds. */
  def mineRules(tx: DataFrame): DataFrame =
    Rules.pruneRedundant(
      Rules.mine(tx, "items", minSupport = 0.1, minConfidence = 0.7,
        minLen = 2, maxLen = 4))

  /** Per-cluster re-mining (associationRules.R:349-370, supp=.2 conf=.6). */
  def perClusterRules(df: DataFrame): DataFrame = {
    val tx = transactions(df)
    val groups = tx.select("label").distinct().collect().map(_.getString(0)).sorted
    groups.map { g =>
      Rules.mine(tx.filter(col("label") === g), "items", 0.2, 0.6)
        .withColumn("segment", lit(g))
    }.reduce(_.unionByName(_))
  }
}
