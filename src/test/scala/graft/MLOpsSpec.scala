package graft

import graft.operators.{MLOps, OlsSufficient}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit checks for ML operators not already covered by queries/goldens. */
class MLOpsSpec extends AnyFunSuite {
  lazy val spark = Tables.session(4)

  lazy val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    .select("l_quantity", "l_discount", "l_extendedprice").cache()

  test("M5: decision tree fits better than the mean baseline") {
    val pred = MLOps.decisionTree(li, Seq("l_quantity", "l_discount"), "l_extendedprice")
    val (rmse, _, _) = MLOps.regressionMetrics(pred, "prediction", "l_extendedprice")
    val sd = li.agg(stddev_pop(col("l_extendedprice"))).head().getDouble(0)
    assert(rmse <= sd * 1.001, s"tree rmse $rmse worse than baseline $sd")
  }

  test("M4: caret-style metrics — R2 is squared Pearson corr") {
    import spark.implicits._
    val df = Seq((1.0, 2.1), (2.0, 3.9), (3.0, 6.1), (4.0, 7.9))
      .toDF("label", "prediction")
    val (rmse, r2, mae) = MLOps.regressionMetrics(df, "prediction", "label")
    val r = df.agg(corr(col("prediction"), col("label"))).head().getDouble(0)
    assert(math.abs(r2 - r * r) < 1e-12)
    assert(rmse > 0 && mae > 0)
  }

  test("cardinality guards refuse loudly past injected caps, naming the scale twin") {
    val o = Tables(spark, "/root/testdata/sf0.001", "orders")
    val e1 = intercept[IllegalArgumentException](
      MLOps.stratifiedSplit(o, "o_orderkey", "o_totalprice", 0.8, maxStrata = 1))
    assert(e1.getMessage.contains("hash-bucket stratifier"))
    val e2 = intercept[IllegalArgumentException](
      MLOps.rLevels(o, "o_orderpriority", maxLevels = 2))
    assert(e2.getMessage.contains("hashing-trick"))
    val cu = Tables(spark, "/root/testdata/sf0.001", "customer")
    val e3 = intercept[IllegalArgumentException](
      graft.operators.Rules.perGroupMine(cu, "c_mktsegment",
        Seq("c_nationkey"), 0.05, 0.25, maxGroups = 1))
    assert(e3.getMessage.contains("segmentEncodedMine"))
    // at-the-cap passes: the boundary itself is admissible
    assert(MLOps.rLevels(o, "o_orderstatus", maxLevels = 3).nonEmpty)
  }

  test("M2: stratified split is deterministic and ~80/20 per stratum") {
    val o = Tables(spark, "/root/testdata/sf0.001", "orders")
    val (tr1, te1) = MLOps.stratifiedSplit(o, "o_orderkey", "o_totalprice", 0.8)
    val (tr2, _) = MLOps.stratifiedSplit(o, "o_orderkey", "o_totalprice", 0.8)
    assert(tr1.count() == tr2.count())
    val frac = tr1.count().toDouble / o.count()
    assert(frac > 0.7 && frac < 0.9)
    assert(tr1.count() + te1.count() == o.count())
  }

  test("M6: RF importances deterministic, non-negative, normalized (q57 internals)") {
    val o = Tables(spark, "/root/testdata/sf0.001", "orders")
    def run() = MLOps.randomForestImportances(o,
      Seq("o_custkey", "o_totalprice"), "o_orderkey", numTrees = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val a = run()
    assert(a.keySet == Set("o_custkey", "o_totalprice"))
    assert(a.values.forall(_ >= 0))
    assert(math.abs(a.values.sum - 1.0) <= 1e-9)
    assert(run() == a, "seeded fit must be reproducible")
  }

  test("M8: RFF-SVR grid fit metrics sane and deterministic (q62 internals)") {
    val liF = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .filter(col("l_orderkey") < 2000)
    def run() = {
      val pred = MLOps.rffRegression(liF, Seq("l_quantity", "l_discount"),
        "l_extendedprice", numFeatures = 16)
      MLOps.regressionMetrics(pred, "prediction", "l_extendedprice")
    }
    val (rmse, r2, mae) = run()
    assert(!rmse.isNaN && !rmse.isInfinite && rmse > 0)
    assert(r2 > 0 && r2 <= 1.0)
    assert(mae > 0 && mae <= rmse + 1e-9)
    assert(run() == ((rmse, r2, mae)), "seeded grid fit must be reproducible")
  }

  test("A12: standardize produces mean 0 / sample sd 1") {
    val (scaled, center, scale) = MLOps.standardize(li, Seq("l_quantity", "l_extendedprice"))
    assert(center.length == 2 && scale.length == 2)
    val stats = scaled.select(
      org.apache.spark.ml.stat.Summarizer.mean(col("scaled")),
      org.apache.spark.ml.stat.Summarizer.variance(col("scaled"))).head()
    val means = stats.getAs[org.apache.spark.ml.linalg.Vector](0).toArray
    val vars = stats.getAs[org.apache.spark.ml.linalg.Vector](1).toArray
    means.foreach(m => assert(math.abs(m) < 1e-9))
    vars.foreach(v => assert(math.abs(v - 1.0) < 1e-9))
  }

  test("OlsSufficient (Cramer over exact sums) agrees with MLlib's normal solver") {
    val full = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val feats = Seq("l_quantity", "l_discount", "l_tax")
    val cramer = OlsSufficient.fit(full, feats, "l_extendedprice")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val mllib = MLOps.ols(full, feats, "l_extendedprice")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(3))).toMap
    assert(cramer.keySet == mllib.keySet)
    cramer.foreach { case (term, (est, t)) =>
      val (est2, t2) = mllib(term)
      val scale = math.max(math.abs(est2), 1e-9)
      assert(math.abs(est - est2) / scale < 1e-6, s"$term estimate $est vs $est2")
      assert(math.abs(t - t2) / math.max(math.abs(t2), 1e-9) < 1e-4, s"$term t $t vs $t2")
    }
  }
}
