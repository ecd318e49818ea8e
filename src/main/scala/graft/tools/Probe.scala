package graft.tools

import graft.pipeline._
import org.apache.spark.sql.functions._

/** Dev tool: time the phase-4 mining stages to find the slow step. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.session(8)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val mlReady = t("mlReady")(CarPricePipeline.mlReady(CarPricePipeline.clean(
      CarPricePipeline.load(spark, "/root/reference/CarPrice_Assignment.csv"))).cache())
    mlReady.count()
    val (labeled, _) = t("cluster")(CarClusteringPipeline.cluster(mlReady))
    val withBrand = t("brand+bin")(
      CarRulesPipeline.recoverBrand(CarRulesPipeline.binned(labeled)).cache())
    withBrand.count()
    val tx = CarRulesPipeline.transactions(withBrand).cache()
    tx.count()
    val rules = t("mine")(graft.operators.Rules.mine(tx, "items", 0.1, 0.7, 2, 4).cache())
    println("[probe] n_rules = " + t("count rules")(rules.count()))
    val pruned = t("prune")(graft.operators.Rules.pruneRedundant(rules).cache())
    println("[probe] n_pruned = " + t("count pruned")(pruned.count()))
    val elbow = t("elbow")(CarClusteringPipeline.elbow(mlReady, Seq(1, 2, 3, 5, 8)).collect())
    println("[probe] elbow = " + elbow.mkString(","))
    val pc = t("perCluster")(CarRulesPipeline.perClusterRules(withBrand).cache())
    println("[probe] n_percluster = " + t("count pc")(pc.count()))
    spark.stop()
  }
}
