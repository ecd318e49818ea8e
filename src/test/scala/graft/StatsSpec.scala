package graft

import graft.functions.Stats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stats operators vs published R conclusions for the reference dataset
  * (BigDataProject.R:178-270: H1 fail-to-reject on fueltype, H2 reject on
  * carbody, H3 significant horsepower~price) and textbook studentized-range
  * critical values for ptukey.
  */
class StatsSpec extends AnyFunSuite {
  lazy val spark = Tables.session(4)
  lazy val car = {
    val raw = spark.read.option("header", "true").option("inferSchema", "true")
      .csv("/root/reference/CarPrice_Assignment.csv")
    raw.toDF(raw.columns.map(_.toLowerCase).toIndexedSeq: _*)
  }

  test("ptukey reproduces textbook studentized-range critical values") {
    // q(0.95; k=3, df=10) = 3.877, q(0.95; k=3, df=inf) = 3.314,
    // q(0.95; k=2, df=inf) = 2.772 (= sqrt(2) * 1.960)
    assert(math.abs(Stats.ptukey(3.877, 3, 10) - 0.95) < 3e-3)
    assert(math.abs(Stats.ptukey(3.314, 3, 1e9) - 0.95) < 3e-3)
    assert(math.abs(Stats.ptukey(2.772, 2, 1e9) - 0.95) < 3e-3)
  }

  test("H1: Welch t-test price~fueltype fails to reject (p > 0.05)") {
    val r = Stats.welchT(car, "price", "fueltype", "diesel", "gas").head()
    val p = r.getAs[Double]("p_value")
    assert(p > 0.05, s"expected fail-to-reject, got p=$p")
  }

  test("H2: ANOVA price~carbody rejects (p < 0.05)") {
    val r = Stats.anovaF(car, "price", "carbody").head()
    val p = r.getAs[Double]("p_value")
    assert(p < 0.05, s"expected reject, got p=$p")
    assert(r.getAs[Int]("k_groups") == 5)
  }

  test("H3: correlation test horsepower~price is significant, r ~ 0.81") {
    val r = Stats.corrTest(car, "horsepower", "price").head()
    assert(r.getAs[Double]("p_value") < 1e-10)
    assert(math.abs(r.getAs[Double]("r") - 0.81) < 0.02)
  }

  test("Tukey HSD on carbody yields k*(k-1)/2 pairs with sane intervals") {
    val t = Stats.tukeyHSD(car, "price", "carbody").collect()
    assert(t.length == 10) // 5 body types -> 10 pairs
    t.foreach { row =>
      val (d, lo, hi) = (row.getAs[Double]("diff"), row.getAs[Double]("lwr"), row.getAs[Double]("upr"))
      assert(lo <= d && d <= hi)
      val p = row.getAs[Double]("p_adj")
      assert(p >= 0.0 && p <= 1.0)
    }
  }

  test("confusion matrix: perfect prediction gives kappa 1") {
    import spark.implicits._
    val df = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("b", "b")).toDF("p", "l")
    val m = Stats.confusionMatrix(df, "p", "l").head()
    assert(m.getAs[Double]("accuracy") == 1.0)
    assert(m.getAs[Double]("kappa") == 1.0)
  }

  test("chi2Independence matches the hand-computed 2x2 value") {
    import spark.implicits._
    // 2x2 table: a={x,y} vs b={u,v} with counts 20/10/10/20
    val rows = Seq.fill(20)(("x", "u")) ++ Seq.fill(10)(("x", "v")) ++
      Seq.fill(10)(("y", "u")) ++ Seq.fill(20)(("y", "v"))
    val df = rows.toDF("a", "b")
    val r = graft.functions.Stats.chi2Independence(df, "a", "b").head()
    // margins 30/30, n=60, expected all 15: chi2 = 4 * 25/15 = 6.6667
    assert(math.abs(r.getDouble(0) - 20.0 / 3.0) < 1e-9)
    assert(r.getLong(1) == 1L && r.getLong(2) == 60L)
  }
}
