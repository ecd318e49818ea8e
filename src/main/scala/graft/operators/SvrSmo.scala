package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT RBF ε-SVR — the real support-vector machine the reference fits
  * (`BigDataProject.R:370-376`, e1071::svm type="eps-regression"),
  * closing the documented RFF deviation (`MLOps.rffRegression` remains
  * the 100-TB tier; this is the reference-parity tier).
  *
  * Solver: SMO with maximal-violating-pair working-set selection on the
  * standard 2n-variable dual (Platt 1998; Fan/Chen/Lin, "Working set
  * selection using second order information", JMLR 2005 — the WSS1
  * variant; Smola & Schölkopf, "A tutorial on support vector
  * regression", 2004):
  *
  *   min ½ αᵀQ̄α + pᵀα,  0 ≤ α_k ≤ C,  Σ r_k α_k = 0
  *
  * with k < n the α side (r=+1, p_k = ε − y_k) and k ≥ n the α* side
  * (r=−1, p_k = ε + y_k), Q̄_kl = r_k r_l K(k mod n, l mod n). The
  * expansion coefficient is β_i = α_i − α*_i and f(x) = Σ β_i K(x_i,x)+b.
  *
  * The solve is DRIVER-SIDE over a BOUNDED training set — the honest
  * shape: the reference's SVR trains on ~160 rows, and SVR training is
  * inherently O(n²) memory in the kernel matrix, so a cluster engine
  * caps the training sample (`trainRows`) and distributes the SCORING
  * (a codegen literal-SV expression, [[predictExpr]]). Deterministic:
  * no randomness anywhere (the id-ordered sample, the maximal-violating
  * pair rule and IEEE arithmetic fix the trajectory).
  *
  * Correctness oracle: the problem is a convex QP, so KKT residuals and
  * the primal–dual gap certify optimality without any reference
  * implementation — both asserted in SvrSpec and summarized in the
  * model (`kktViolation` = m(α) − M(α) at exit).
  */
object SvrSmo {

  final case class Model(svX: Array[Array[Double]], svBeta: Array[Double],
                         b: Double, gamma: Double, eps: Double, c: Double,
                         iters: Int, kktViolation: Double, nTrain: Int,
                         trainBeta: Array[Double])

  def rbf(gamma: Double, u: Array[Double], v: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < u.length) { val d = u(i) - v(i); s += d * d; i += 1 }
    math.exp(-gamma * s)
  }

  /** Fit on an in-memory training set. gamma ≤ 0 → 1/dim (the e1071
    * default); tol is the KKT stopping threshold on m(α) − M(α). */
  def fit(x: Array[Array[Double]], y: Array[Double], c: Double = 1.0,
          eps: Double = 0.1, gammaIn: Double = -1.0, tol: Double = 1e-6,
          maxIter: Int = 200000): Model = {
    val n = x.length
    require(n >= 2, "SVR needs at least 2 training rows")
    require(c > 0 && eps >= 0, s"bad SVR params C=$c eps=$eps")
    val gamma = if (gammaIn > 0) gammaIn else 1.0 / x(0).length
    val K = Array.tabulate(n, n)((i, j) => rbf(gamma, x(i), x(j)))
    val m2 = 2 * n
    @inline def r(k: Int): Int = if (k < n) 1 else -1
    @inline def base(k: Int): Int = if (k < n) k else k - n
    val alpha = new Array[Double](m2)
    // G_k = (Q̄α)_k + p_k; at α = 0: G = p
    val grad = Array.tabulate(m2)(k => if (k < n) eps - y(k) else eps + y(k - n))
    var it = 0
    var viol = Double.MaxValue
    var mUp = 0.0
    var mLow = 0.0
    while (it < maxIter && viol > tol) {
      // maximal violating pair: i = argmax_{I_up} (−r G), j = argmin_{I_low} (−r G)
      var iSel = -1; var jSel = -1
      mUp = Double.NegativeInfinity; mLow = Double.PositiveInfinity
      var k = 0
      while (k < m2) {
        val v = -r(k) * grad(k)
        val inUp = if (r(k) == 1) alpha(k) < c else alpha(k) > 0
        val inLow = if (r(k) == 1) alpha(k) > 0 else alpha(k) < c
        if (inUp && v > mUp) { mUp = v; iSel = k }
        if (inLow && v < mLow) { mLow = v; jSel = k }
        k += 1
      }
      viol = mUp - mLow
      if (viol > tol) {
        val i = iSel; val j = jSel
        val bi = base(i); val bj = base(j)
        // feasible direction: Δα_i = r_i u, Δα_j = −r_j u
        val eta0 = K(bi)(bi) + K(bj)(bj) - 2.0 * K(bi)(bj)
        val eta = if (eta0 > 1e-12) eta0 else 1e-12
        var u = (mUp - mLow) / eta // = −(r_i G_i − r_j G_j)/η, positive
        // box: α_i ∈ [0,C] and α_j ∈ [0,C]
        val uMaxI = if (r(i) == 1) c - alpha(i) else alpha(i)
        val uMaxJ = if (r(j) == 1) alpha(j) else c - alpha(j)
        u = math.min(u, math.min(uMaxI, uMaxJ))
        val dAi = r(i) * u
        val dAj = -r(j) * u
        alpha(i) += dAi
        alpha(j) += dAj
        // gradient refresh: G_k += Q̄_ki ΔAi + Q̄_kj ΔAj
        k = 0
        while (k < m2) {
          val bk = base(k)
          grad(k) += r(k) * (r(i) * K(bk)(bi) * dAi + r(j) * K(bk)(bj) * dAj)
          k += 1
        }
      }
      it += 1
    }
    // KKT multiplier: every I_up member requires b ≥ −r·G, every I_low
    // member b ≤ −r·G, so b sits between the two extremes (they pinch
    // to equality at a free SV)
    val b = (mUp + mLow) / 2.0
    val beta = Array.tabulate(n)(i => alpha(i) - alpha(i + n))
    val svIdx = beta.indices.filter(i => math.abs(beta(i)) > 1e-12).toArray
    Model(svIdx.map(x), svIdx.map(beta), b, gamma, eps, c, it,
      math.max(viol, 0.0), n, beta)
  }

  /** Driver-side single-point prediction (the spec/tune evaluator). */
  def predictOne(m: Model, v: Array[Double]): Double =
    m.svX.zip(m.svBeta).map { case (sv, b) => b * rbf(m.gamma, sv, v) }.sum + m.b

  /** e1071 `tune.svm` analog for the exact tier: k-fold CV over a
    * cost×gamma grid on the bounded training set. Folds are id-order
    * round-robin — deterministic, no RNG (the reference's random 10-fold
    * makes its winner seed-dependent; a deterministic fold rule is the
    * engine-portable equivalent, same trade as the M2 hash split). Ties
    * break to the earlier grid point. Grid cells are independent pure
    * fits, so they run CONCURRENTLY on the shared bounded [[FitPool]]
    * (the elbow/per-segment discipline, round 9): in-flight count
    * hard-capped, excess cells queue, and the surface/winner are
    * deterministic regardless of completion order (results keyed by
    * grid point, stable tie-break). Returns the winning model refit on
    * ALL rows plus the CV-MSE surface. */
  def gridTune(x: Array[Array[Double]], y: Array[Double],
               costs: Seq[Double], gammas: Seq[Double], folds: Int = 5,
               eps: Double = 0.1): (Model, Map[(Double, Double), Double]) = {
    require(x.length >= folds, s"need at least $folds rows for $folds-fold CV")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import FitPool.ec
    val cells = for (c <- costs; g <- gammas) yield (c, g)
    val futures = cells.map { case cg @ (c, g) =>
      FitPool.submit {
        val mse = (0 until folds).map { f =>
          val trainIdx = x.indices.filter(_ % folds != f)
          val testIdx = x.indices.filter(_ % folds == f)
          val m = fit(trainIdx.map(x).toArray, trainIdx.map(y).toArray, c, eps, g)
          testIdx.map { i => val e = predictOne(m, x(i)) - y(i); e * e }.sum / testIdx.length
        }.sum / folds
        cg -> mse
      }
    }
    val surface = Await.result(Future.sequence(futures), Duration.Inf).toMap
    val (bestC, bestG) = cells.minBy(surface) // stable minBy: earlier grid point wins ties
    (fit(x, y, bestC, eps, bestG), surface)
  }

  /** Persist a fitted model as one-row parquet (S4 contract — the
    * saveRDS analog): support vectors and coefficients as nested
    * arrays, scalars alongside. */
  def save(m: Model, path: String,
           spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    Seq((m.svX.map(_.toSeq).toSeq, m.svBeta.toSeq, m.b, m.gamma, m.eps, m.c,
        m.iters, m.kktViolation, m.nTrain, m.trainBeta.toSeq))
      .toDF("sv_x", "sv_beta", "b", "gamma", "eps", "c",
        "iters", "kkt_violation", "n_train", "train_beta")
      .write.mode("overwrite").parquet(path)
  }

  def load(path: String, spark: org.apache.spark.sql.SparkSession): Model = {
    val r = spark.read.parquet(path).head()
    Model(
      r.getAs[scala.collection.Seq[scala.collection.Seq[Double]]](0).map(_.toArray).toArray,
      r.getAs[scala.collection.Seq[Double]](1).toArray,
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
      r.getInt(6), r.getDouble(7), r.getInt(8),
      r.getAs[scala.collection.Seq[Double]](9).toArray)
  }

  /** f(x) over the support vectors as one codegen expression on an
    * array<double> feature column: Σ β_i · exp(−γ(|x|² − 2x·sv_i +
    * |sv_i|²)) + b — |sv_i|² are literals, x·sv_i the native dot
    * kernel, |x|² computed once. Scoring distributes over any corpus
    * size; only the bounded FIT is driver-side. */
  def predictExpr(model: Model, features: Column): Column = {
    val xx = graft.functions.VectorExpressions.dot(features, features)
    if (model.svX.isEmpty) lit(model.b)
    else model.svX.zip(model.svBeta).map { case (sv, beta) =>
      val svNorm2 = sv.map(v => v * v).sum
      lit(beta) * exp(lit(-model.gamma) *
        (xx - lit(2.0) * graft.functions.VectorExpressions.dot(
          features, typedLit(sv.toSeq)) + lit(svNorm2)))
    }.reduce(_ + _) + lit(model.b)
  }

  /** Fit on the id-ordered bounded prefix of a DataFrame (TakeOrdered —
    * deterministic; `trainRows` caps the O(n²) kernel work) and return
    * (model, scored frame with a `prediction` column over ALL rows). */
  def fitPredict(df: DataFrame, features: Seq[String], label: String,
                 orderCol: String, c: Double = 1.0, eps: Double = 0.1,
                 gamma: Double = -1.0, trainRows: Int = 256): (Model, DataFrame) = {
    val fcol = array(features.map(f => col(f).cast("double")): _*)
    val train = df.select(col(orderCol), fcol.as("__f"), col(label).cast("double").as("__y"))
      .orderBy(orderCol).limit(trainRows).collect()
    val x = train.map(_.getSeq[Double](1).toArray)
    val y = train.map(_.getDouble(2))
    val model = fit(x, y, c, eps, gamma)
    (model, df.withColumn("prediction", predictExpr(model, fcol)))
  }
}
