package graft

import graft.operators.SvrSmo
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact RBF ε-SVR: the solver is certified against the MATH, not a
  * reference implementation — SVR's dual is a convex QP, so KKT
  * residuals and a primal–dual gap of ~0 are a complete optimality
  * proof for the returned solution. Plus behavioral pins (tube fit,
  * near-interpolation), the distributed-scoring equivalence, and
  * determinism.
  */
class SvrSpec extends AnyFunSuite {
  lazy val spark = Tables.session(4)

  private def kernelMatrix(x: Array[Array[Double]], gamma: Double) =
    Array.tabulate(x.length, x.length)((i, j) => SvrSmo.rbf(gamma, x(i), x(j)))

  /** Full KKT + duality-gap certification of a fitted model on its own
    * training set. */
  private def certify(x: Array[Array[Double]], y: Array[Double],
                      m: SvrSmo.Model, tolK: Double = 1e-4): Unit = {
    val n = x.length
    val beta = m.trainBeta
    assert(math.abs(beta.sum) <= 1e-8, s"equality constraint violated: ${beta.sum}")
    assert(beta.forall(b => b >= -m.c - 1e-9 && b <= m.c + 1e-9))
    val K = kernelMatrix(x, m.gamma)
    val g = Array.tabulate(n)(i => (0 until n).map(j => beta(j) * K(i)(j)).sum)
    val r = Array.tabulate(n)(i => y(i) - g(i) - m.b)
    (0 until n).foreach { i =>
      val b = beta(i)
      if (math.abs(b) <= 1e-12)
        assert(math.abs(r(i)) <= m.eps + tolK, s"interior point $i leaves the tube: ${r(i)}")
      else if (b > 0 && b < m.c - 1e-9)
        assert(math.abs(r(i) - m.eps) <= tolK, s"free +SV $i: residual ${r(i)} != eps")
      else if (b >= m.c - 1e-9)
        assert(r(i) >= m.eps - tolK, s"bound +SV $i: residual ${r(i)} < eps")
      else if (b < 0 && b > -m.c + 1e-9)
        assert(math.abs(r(i) + m.eps) <= tolK, s"free -SV $i: residual ${r(i)} != -eps")
      else
        assert(r(i) <= -m.eps + tolK, s"bound -SV $i: residual ${r(i)} > -eps")
    }
    // duality gap: (beta+, beta-) is dual-feasible, so D(beta) bounds the
    // primal from below; at the optimum the gap vanishes
    val wNorm2 = (0 until n).map(i => beta(i) * g(i)).sum
    val primal = 0.5 * wNorm2 +
      m.c * r.map(ri => math.max(0.0, math.abs(ri) - m.eps)).sum
    val dual = -(0.5 * wNorm2 + m.eps * beta.map(math.abs).sum -
      (0 until n).map(i => beta(i) * y(i)).sum)
    assert(primal - dual >= -1e-6, s"gap must be nonnegative: ${primal - dual}")
    assert(primal - dual <= 1e-3 * (1 + math.abs(primal)),
      s"duality gap too large: P=$primal D=$dual")
  }

  test("data inside the tube fits with zero support vectors") {
    val x = Array.tabulate(20)(i => Array(i.toDouble / 20))
    val y = Array.tabulate(20)(i => 0.05 * (i % 3)) // range 0..0.1 <= 2*eps
    val m = SvrSmo.fit(x, y, c = 1.0, eps = 0.1)
    assert(m.svX.isEmpty, s"expected no SVs, got ${m.svX.length}")
    assert(y.forall(v => math.abs(v - m.b) <= 0.1 + 1e-6))
    certify(x, y, m)
  }

  test("KKT + duality gap certify optimality on the reference CarPrice data") {
    val car = spark.read.option("header", "true").option("inferSchema", "true")
      .csv("/root/reference/CarPrice_Assignment.csv")
      .select(col("horsepower").cast("double"), col("curbweight").cast("double"),
        col("enginesize").cast("double"), col("price").cast("double"))
      .collect()
    def zs(vs: Array[Double]) = {
      val mu = vs.sum / vs.length
      val sd = math.sqrt(vs.map(v => (v - mu) * (v - mu)).sum / (vs.length - 1))
      vs.map(v => (v - mu) / sd)
    }
    val cols = (0 until 4).map(j => zs(car.map(_.getDouble(j))))
    val x = Array.tabulate(car.length)(i => Array(cols(0)(i), cols(1)(i), cols(2)(i)))
    val y = cols(3)
    val m = SvrSmo.fit(x, y) // e1071 defaults: C=1, eps=0.1, gamma=1/3
    assert(m.kktViolation <= 1e-6, s"solver did not converge: ${m.kktViolation}")
    assert(m.svX.nonEmpty && m.svX.length < x.length,
      s"expect a sparse SV set, got ${m.svX.length}/${x.length}")
    certify(x, y, m)
    // determinism
    val m2 = SvrSmo.fit(x, y)
    assert(m2.b == m.b && m2.svBeta.toSeq == m.svBeta.toSeq)
  }

  test("large C + small eps near-interpolates a smooth function") {
    val x = Array.tabulate(40)(i => Array(i / 40.0 * 2 * math.Pi))
    val y = x.map(v => math.sin(v(0)))
    val m = SvrSmo.fit(x, y, c = 100.0, eps = 0.01, gammaIn = 1.0)
    val g = Array.tabulate(40)(i =>
      m.svX.zip(m.svBeta).map { case (sv, bv) => bv * SvrSmo.rbf(1.0, sv, x(i)) }.sum + m.b)
    (0 until 40).foreach(i => assert(math.abs(g(i) - y(i)) <= 0.02,
      s"interpolation misses at $i: ${g(i)} vs ${y(i)}"))
    certify(x, y, m)
  }

  test("distributed scoring expression == driver-side kernel sum") {
    import spark.implicits._
    val x = Array.tabulate(30)(i => Array(i / 30.0, (i % 5).toDouble))
    val y = Array.tabulate(30)(i => x(i)(0) * 2 + x(i)(1))
    val m = SvrSmo.fit(x, y, c = 10.0, eps = 0.05)
    val df = x.zipWithIndex.toSeq.map { case (v, i) => (i, v(0), v(1)) }
      .toDF("id", "f1", "f2")
    val scored = df.withColumn("prediction",
        SvrSmo.predictExpr(m, array(col("f1"), col("f2"))))
      .orderBy("id").collect().map(_.getAs[Double]("prediction"))
    val driver = x.map(v =>
      m.svX.zip(m.svBeta).map { case (sv, bv) => bv * SvrSmo.rbf(m.gamma, sv, v) }.sum + m.b)
    scored.zip(driver).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-9, s"$a vs $b") }
  }

  test("gridTune: the reported winner is the argmin of an independently recomputed CV surface") {
    val x = Array.tabulate(60)(i => Array(i / 60.0 * 4))
    val y = x.map(v => math.sin(v(0)) + 0.05 * math.cos(7 * v(0)))
    val costs = Seq(0.1, 1.0, 10.0)
    val gammas = Seq(0.5, 2.0)
    val (best, surface) = SvrSmo.gridTune(x, y, costs, gammas, folds = 5)
    assert(surface.size == 6)
    // independent recomputation of one grid point must match exactly
    val (c0, g0) = (costs(1), gammas(0))
    val recomputed = (0 until 5).map { f =>
      val tr = x.indices.filter(_ % 5 != f)
      val te = x.indices.filter(_ % 5 == f)
      val m = SvrSmo.fit(tr.map(x).toArray, tr.map(y).toArray, c0, 0.1, g0)
      te.map { i => val e = SvrSmo.predictOne(m, x(i)) - y(i); e * e }.sum / te.length
    }.sum / 5
    assert(surface((c0, g0)) == recomputed)
    // the refit winner carries the argmin's params
    val argmin = surface.minBy(_._2)._1
    assert(best.c == argmin._1 && best.gamma == argmin._2)
    certify(x, y, best)
  }

  test("gridTune runs its grid on the bounded FitPool; result independent of scheduling") {
    val x = Array.tabulate(40)(i => Array(i / 40.0 * 4))
    val y = x.map(v => math.sin(v(0)))
    val costs = Seq(0.1, 0.5, 1.0, 5.0, 10.0)
    val gammas = Seq(0.25, 0.5, 1.0, 2.0, 4.0)
    graft.operators.FitPool.resetPeak()
    val (best1, surf1) = SvrSmo.gridTune(x, y, costs, gammas, folds = 4)
    // the 25 cells were pooled: concurrency observed but hard-capped
    assert(graft.operators.FitPool.peakActive >= 1 &&
      graft.operators.FitPool.peakActive <= graft.operators.FitPool.parallelism,
      s"grid fits escaped the pool bound: peak=${graft.operators.FitPool.peakActive}")
    // deterministic regardless of completion order: a second run agrees
    // bit-for-bit on the surface and the winner
    val (best2, surf2) = SvrSmo.gridTune(x, y, costs, gammas, folds = 4)
    assert(surf1 == surf2)
    assert(best1.c == best2.c && best1.gamma == best2.gamma &&
      best1.b == best2.b && best1.svBeta.toSeq == best2.svBeta.toSeq)
  }

  test("save/load round-trip: reloaded model predicts bit-identically (S4 contract)") {
    import spark.implicits._
    val x = Array.tabulate(30)(i => Array(i / 30.0, (i % 5).toDouble))
    val y = Array.tabulate(30)(i => x(i)(0) * 2 + x(i)(1))
    val m = SvrSmo.fit(x, y, c = 10.0, eps = 0.05)
    val path = java.nio.file.Files.createTempDirectory("svr_model").toString + "/m"
    SvrSmo.save(m, path, spark)
    val loaded = SvrSmo.load(path, spark)
    assert(loaded.b == m.b && loaded.gamma == m.gamma &&
      loaded.svBeta.toSeq == m.svBeta.toSeq &&
      loaded.svX.map(_.toSeq).toSeq == m.svX.map(_.toSeq).toSeq)
    val df = x.zipWithIndex.toSeq.map { case (v, i) => (i, v(0), v(1)) }
      .toDF("id", "f1", "f2")
    val a = df.withColumn("p", SvrSmo.predictExpr(m, array(col("f1"), col("f2"))))
      .orderBy("id").collect().map(_.getAs[Double]("p"))
    val b = df.withColumn("p", SvrSmo.predictExpr(loaded, array(col("f1"), col("f2"))))
      .orderBy("id").collect().map(_.getAs[Double]("p"))
    assert(a.sameElements(b), "reloaded model predictions diverge")
  }

  test("fitPredict scores every row with the bounded-prefix fit") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .filter(col("l_orderkey") < 500)
      .withColumn("__ord", col("l_orderkey") * 16 + col("l_linenumber"))
    val (m, scored) = SvrSmo.fitPredict(li, Seq("l_quantity", "l_discount"),
      "l_extendedprice", "__ord", trainRows = 64)
    assert(m.nTrain == 64)
    assert(scored.count() == li.count())
    assert(scored.filter(col("prediction").isNull).count() == 0)
  }
}
