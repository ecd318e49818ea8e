package graft

import graft.operators.{Cleaning, Dedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5.3): invariants that must hold for any input,
  * over seeded ScalaCheck generators (deterministic; one Spark round-trip
  * per case, so the case count is bounded).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = Tables.session(4)
  import spark.implicits._

  private def cases[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong * 7919 + 1)))

  val doubleLists: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6))

  test("iqrCap never widens the range and is stable under re-capping") {
    cases(doubleLists, 8).foreach { xs =>
      val df = xs.toDF("v")
      val once = Cleaning.iqrCap(df, Seq("v"))
      val a = once.orderBy("v").collect().map(_.getDouble(0))
      assert(a.max <= xs.max + 1e-9 && a.min >= xs.min - 1e-9)
      val twice = Cleaning.iqrCap(once, Seq("v"))
      val b = twice.orderBy("v").collect().map(_.getDouble(0))
      assert(b.max <= a.max + 1e-9 && b.min >= a.min - 1e-9)
    }
  }

  test("medianImpute leaves no nulls and keeps row count") {
    val g = Gen.nonEmptyListOf(Gen.option(Gen.choose(-1e6, 1e6)))
      .suchThat(_.exists(_.isDefined))
    cases(g, 8).foreach { xs =>
      val out = Cleaning.medianImpute(xs.toDF("v"), Seq("v"))
      assert(out.filter(col("v").isNull).count() == 0)
      assert(out.count() == xs.length)
    }
  }

  test("cutLabels labels exactly the in-range values") {
    cases(doubleLists, 8).foreach { xs =>
      val out = xs.toDF("v").withColumn("b",
        Cleaning.cutLabels(col("v"), Seq(-5e5, 0.0, 5e5), Seq("neg", "pos")))
      val wrong = out.filter(
        (col("v") >= -5e5 && col("v") <= 5e5 && col("b").isNull) ||
          ((col("v") < -5e5 || col("v") > 5e5) && col("b").isNotNull)).count()
      assert(wrong == 0)
    }
  }

  test("jaccard is symmetric, bounded, and 1 on equal non-empty sets") {
    val toks: Gen[List[String]] = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e"))
    cases(Gen.zip(toks, toks), 12).foreach { case (x, y) =>
      val r = Seq((x.distinct, y.distinct)).toDF("x", "y").select(
        Dedup.jaccard(col("x"), col("y")),
        Dedup.jaccard(col("y"), col("x"))).head()
      val (j1, j2) = (r.getDouble(0), r.getDouble(1))
      assert(j1 == j2)
      assert(j1 >= 0.0 && j1 <= 1.0)
      if (x.toSet == y.toSet && x.nonEmpty) assert(j1 == 1.0)
    }
  }

  test("topNWithTies keeps every row tied with or above the cut") {
    cases(Gen.nonEmptyListOf(Gen.choose(0L, 5L)), 8).foreach { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "cnt")
      val top = Cleaning.topNWithTies(df, "cnt", 2).collect()
      if (xs.length >= 2) assert(top.length >= 2)
      val minKept = top.map(_.getLong(1)).min
      // nothing above the cut was dropped, and everything at the cut kept
      assert(top.count(_.getLong(1) > minKept) == xs.count(_ > minKept))
      assert(top.count(_.getLong(1) == minKept) == xs.count(_ == minKept))
    }
  }

  test("rule interest measures stay in their theoretical ranges") {
    val o = Tables(spark, "/root/testdata/sf0.001", "orders")
    val tx = graft.operators.Rules.toTransactions(o,
      Seq("o_orderstatus", "o_orderpriority")).cache()
    val n = tx.count()
    val rules = graft.operators.Rules.mine(tx, "items", 0.05, 0.2)
    val its = graft.operators.Rules.freqItemsets(tx, "items", 0.05)
    val m = graft.operators.Rules.withMeasures(rules, its, n).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      assert(r.getAs[Double]("coverage") > 0 && r.getAs[Double]("coverage") <= 1)
      assert(r.getAs[Double]("cosine") >= 0 && r.getAs[Double]("cosine") <= 1 + 1e-12)
      assert(math.abs(r.getAs[Double]("leverage")) <= 0.25 + 1e-12)
      assert(r.getAs[Double]("chi_squared") >= -1e-9)
      assert(r.getAs[Double]("lift") > 0)
    }
  }
}
