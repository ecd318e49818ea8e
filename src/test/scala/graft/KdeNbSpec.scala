package graft

import graft.operators.KdeNb
import graft.pipeline.CarPricePipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-density NB (klaR semantics — see KdeNb scaladoc for why the
  * reference's own `usekernel = TRUE` is dead code under e1071). The
  * golden check is an independent plain-Scala twin of the full fit
  * (type-7 IQR → bw.nrd0 → linear binning → exact Gaussian convolution →
  * grid interpolation → log-posterior), run on the reference CSV's
  * price_bucket classes, compared row-for-row against the engine's
  * distributed fit + codegen scoring.
  */
class KdeNbSpec extends AnyFunSuite {
  lazy val spark = Tables.session(4)
  import spark.implicits._

  // ---- plain-Scala twin (independent arithmetic, no Spark) ----
  private def q7(sorted: Array[Double], p: Double): Double = {
    val pos = p * (sorted.length - 1)
    val lo = math.floor(pos).toInt; val hi = math.ceil(pos).toInt
    sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }
  case class TwinDens(n: Int, bw: Double, lo: Double, hi: Double,
                              ys: Array[Double]) {
    def interp(x: Double): Double = {
      val gridN = ys.length
      val dx = (hi - lo) / (gridN - 1)
      val t = (x - lo) / dx
      if (t < 0 || t > gridN - 1) 0.0
      else {
        val j = math.min(math.floor(t), (gridN - 2).toDouble)
        val fr = t - j
        ys(j.toInt) * (1 - fr) + ys(j.toInt + 1) * fr
      }
    }
  }
  private def twinFit(xs: Array[Double], gridN: Int = 512,
                      cut: Double = 3.0): TwinDens = {
    val n = xs.length
    val m = xs.sum / n
    val sd = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    val sorted = xs.sorted
    val iqr = q7(sorted, 0.75) - q7(sorted, 0.25)
    val bw = KdeNb.bwNrd0(n, sd, iqr, math.abs(m))
    val lo = sorted.head - cut * bw; val hi = sorted.last + cut * bw
    val dx = (hi - lo) / (gridN - 1)
    val massArr = new Array[Double](gridN)
    xs.foreach { x =>
      val t = (x - lo) / dx
      val j = math.min(math.floor(t), (gridN - 2).toDouble).toInt
      val fr = t - j
      massArr(j) += 1 - fr; massArr(j + 1) += fr
    }
    val ys = Array.tabulate(gridN) { g =>
      (0 until gridN).map { k =>
        val z = (g - k) * dx / bw
        massArr(k) * math.exp(-0.5 * z * z) / (math.sqrt(2 * math.Pi) * bw)
      }.sum / n
    }
    TwinDens(n, bw, lo, hi, ys)
  }

  test("bw.nrd0 matches R's formula and fallback chain") {
    // x = 1..9: sd = sqrt(7.5), type-7 IQR = 7 - 3 = 4; min picks sd
    assert(KdeNb.bwNrd0(9, math.sqrt(7.5), 4.0, 5.0) ===
      0.9 * math.sqrt(7.5) * math.pow(9.0, -0.2))
    // IQR = 0 but sd > 0 -> sd
    assert(KdeNb.bwNrd0(9, 2.0, 0.0, 5.0) === 0.9 * 2.0 * math.pow(9.0, -0.2))
    // sd = 0 (all equal) -> |x1|
    assert(KdeNb.bwNrd0(9, 0.0, 0.0, 5.0) === 0.9 * 5.0 * math.pow(9.0, -0.2))
    // everything 0 -> 1
    assert(KdeNb.bwNrd0(9, 0.0, 0.0, 0.0) === 0.9 * math.pow(9.0, -0.2))
  }

  lazy val car = {
    val cleaned = CarPricePipeline.clean(
      CarPricePipeline.load(spark, "/root/reference/CarPrice_Assignment.csv"))
    cleaned.select(col("price_bucket"), col("horsepower"), col("enginesize"),
      col("curbweight"), col("citympg"), col("highwaympg"), col("carwidth"),
      col("carlength")).na.drop().cache()
  }
  val nbFeatures = Seq("horsepower", "enginesize", "curbweight", "citympg",
    "highwaympg", "carwidth", "carlength")

  lazy val model = KdeNb.fit(car, nbFeatures, "price_bucket")

  lazy val twinData: Map[(String, String), Array[Double]] = {
    val rows = car.collect()
    (for (f <- nbFeatures) yield rows.groupBy(_.getAs[String]("price_bucket"))
      .map { case (c, rs) =>
        (c, f) -> rs.map(r => r.getAs[Any](f) match {
          case d: Double => d; case i: Int => i.toDouble; case l: Long => l.toDouble
        })
      }).flatten.toMap
  }

  lazy val twins: Map[(String, String), TwinDens] =
    twinData.map { case (k, xs) => k -> twinFit(xs) }

  test("engine fit matches the plain-Scala twin on CarPrice price_bucket") {
    assert(model.classes == Seq("High", "Low", "Medium", "VeryHigh"))
    for (c <- model.classes; f <- nbFeatures) {
      val d = model.density(c, f)
      val t = twins((c, f))
      assert(d.n == t.n, s"($c,$f) n")
      assert(math.abs(d.bw - t.bw) <= 1e-9 * t.bw, s"($c,$f) bw ${d.bw} vs ${t.bw}")
      assert(math.abs(d.lo - t.lo) <= 1e-6 && math.abs(d.hi - t.hi) <= 1e-6,
        s"($c,$f) grid range")
      val yMax = t.ys.max
      val worst = d.ys.zip(t.ys).map { case (a, b) => math.abs(a - b) }.max
      assert(worst <= 1e-9 * yMax, s"($c,$f) grid densities diverge: $worst")
    }
  }

  test("binned-grid density approximates the direct kernel sum") {
    for (c <- model.classes; f <- Seq("horsepower", "curbweight")) {
      val xs = twinData((c, f))
      val t = twins((c, f))
      // direct (unbinned) KDE at the sample points themselves
      xs.distinct.foreach { x0 =>
        val direct = xs.map { xi =>
          val z = (x0 - xi) / t.bw
          math.exp(-0.5 * z * z) / (math.sqrt(2 * math.Pi) * t.bw)
        }.sum / xs.length
        val interp = t.interp(x0)
        assert(math.abs(interp - direct) <= 5e-3 * direct + 1e-12,
          s"($c,$f) at $x0: grid $interp vs direct $direct")
      }
    }
  }

  test("codegen scoring matches the twin's log-posteriors row-for-row") {
    val scored = KdeNb.score(car, model)
      .select(col("*") +: model.classes.indices.map(i => col(s"logp_$i")): _*)
      .collect()
    val nTot = model.counts.values.sum.toDouble
    scored.foreach { r =>
      model.classes.zipWithIndex.foreach { case (c, i) =>
        val expected = math.log(model.counts(c) / nTot) + nbFeatures.map { f =>
          val x = r.getAs[Any](f) match {
            case d: Double => d; case n: Number => n.doubleValue }
          math.log(math.max(twins((c, f)).interp(x), model.threshold))
        }.sum
        val got = r.getAs[Double](s"logp_$i")
        assert(math.abs(got - expected) <= 1e-9 * (1 + math.abs(expected)),
          s"row ${r.getAs[Any]("curbweight")} class $c: $got vs $expected")
      }
    }
  }

  test("densities are nonnegative and integrate to ~1; posteriors normalize") {
    for (d <- model.densities) {
      assert(d.ys.forall(_ >= 0))
      val dx = (d.hi - d.lo) / (model.gridN - 1)
      val integral = d.ys.sum * dx
      assert(math.abs(integral - 1.0) <= 0.005, s"${d.label}/${d.feature}: $integral")
      // Gaussian kernel preserves the mean: grid mean == sample mean
      val kdeMean = d.ys.zipWithIndex.map { case (y, j) =>
        (d.lo + j * dx) * y }.sum * dx / integral
      val xs = twinData((d.label, d.feature))
      val sMean = xs.sum / xs.length
      assert(math.abs(kdeMean - sMean) <= 1e-3 * (math.abs(sMean) + 1),
        s"${d.label}/${d.feature}: kde mean $kdeMean vs $sMean")
    }
    val post = KdeNb.score(car, model)
      .select(model.classes.indices.map(i => col(s"posterior_$i")): _*).collect()
    post.foreach { r =>
      val s = model.classes.indices.map(r.getDouble).sum
      assert(math.abs(s - 1.0) <= 1e-9)
    }
  }

  test("separable classes predict perfectly; ties take the first class") {
    val df = (Seq.tabulate(50)(i => ("a", i * 0.02)) ++
      Seq.tabulate(50)(i => ("b", 100.0 + i * 0.02))).toDF("y", "x")
    val m = KdeNb.fit(df, Seq("x"), "y")
    val acc = KdeNb.score(df, m).filter(col("pred") === col("y")).count()
    assert(acc == 100)
  }

  test("NULL features are skipped, not fatal (e1071 NA handling)") {
    val df = (Seq(("a", Some(1.0), 10.0), ("a", Some(2.0), 11.0),
      ("a", Some(3.0), 12.0), ("b", Some(8.0), 30.0), ("b", Some(9.0), 31.0),
      ("b", None, 32.0))).toDF("y", "x1", "x2")
    val m = KdeNb.fit(df, Seq("x1", "x2"), "y")
    val got = KdeNb.score(Seq((Option.empty[Double], 30.5)).toDF("x1", "x2"), m)
      .select("pred").head().getString(0)
    assert(got == "b") // x1 missing -> decided on x2 alone
  }

  test("grid-tuple budget refuses loudly before scheduling distributed work") {
    import spark.implicits._
    val df = Seq((1.0, "a"), (2.0, "a"), (3.0, "b"), (4.0, "b"))
      .toDF("x", "cls")
    // 2 classes x 1 feature x gridN 512 = 1024 tuples; an injected cap
    // of 1000 must fire the computed budget check, naming the knobs
    val e = intercept[IllegalArgumentException](
      KdeNb.fit(df, Seq("x"), "cls", maxGridTuples = 1000L))
    assert(e.getMessage.contains("grid tuples") &&
      e.getMessage.contains("gridN") &&
      e.getMessage.contains("exactBandwidth=false"))
    // under the cap the same fit succeeds (smaller grid — the named remedy)
    val m = KdeNb.fit(df, Seq("x"), "cls", gridN = 128, maxGridTuples = 1000L)
    assert(m.classes == Seq("a", "b") && m.densities.size == 2)
  }

  test("model save/load round-trips exactly") {
    val dir = java.nio.file.Files.createTempDirectory("kdenb").toString
    KdeNb.saveModel(model, s"$dir/m")(spark)
    val back = KdeNb.loadModel(spark, s"$dir/m")
    assert(back.classes == model.classes && back.counts == model.counts &&
      back.features == model.features && back.gridN == model.gridN &&
      back.threshold == model.threshold)
    model.densities.foreach { d =>
      val b = back.density(d.label, d.feature)
      assert(b.bw == d.bw && b.lo == d.lo && b.hi == d.hi &&
        b.ys.toSeq == d.ys.toSeq && b.n == d.n)
    }
  }

  private implicit class DoubleEq(a: Double) {
    def ===(b: Double): Boolean = math.abs(a - b) <= 1e-12 * (1 + math.abs(b))
  }
}
