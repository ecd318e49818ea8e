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

  // ------------------------------------------------------------------
  // Golden comparison vs the reference's committed clustering outputs
  // (clustering.R:162 car_data_with_clusters.csv, :165 cluster_centers.csv).
  // The golden CSVs carry the case-colliding brand.nissan/brand.Nissan
  // headers, so they are parsed with plain Scala (no Spark CSV reader
  // header mangling) — 206 lines, driver-side is the right place.
  // Rows carry no id and R's merge() re-sorted them by cluster, so rows
  // pair by their full (features, price) tuple; assignments compare up to
  // a cluster-label permutation exactly as SURVEY §5.1 prescribes.

  private def parseQuotedCsv(path: String): (Array[String], Seq[Array[String]]) = {
    val lines = scala.io.Source.fromFile(path).getLines().toIndexedSeq
    def cells(l: String) = l.split(",", -1).map(_.stripPrefix("\"").stripSuffix("\""))
    (cells(lines.head), lines.tail.map(cells))
  }

  /** Same collision-safe renaming CarClusteringPipeline applies, so golden
    * header names line up with the sanitized frame. */
  private def sanitize(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Map[String, Int]()
    names.map { c =>
      val base = c.replace(".", "_")
      val n = seen.getOrElse(base.toLowerCase, 0)
      seen(base.toLowerCase) = n + 1
      if (n == 0) base else s"${base}__$n"
    }
  }

  private def rowKey(vals: Seq[Double]): String = vals.map(v => f"$v%.4f").mkString("|")

  private lazy val goldenAssignments: Map[String, Seq[Int]] = {
    val (hdr, rows) = parseQuotedCsv("/root/reference/car_data_with_clusters.csv")
    val names = sanitize(hdr.toSeq)
    val featIdx = names.zipWithIndex.filter { case (n, _) =>
      n != "cluster" && n != "label" }
    (rows.map { r =>
      val key = rowKey(featIdx.map { case (_, i) => r(i).toDouble })
      key -> r(names.indexOf("cluster")).toInt
    }).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted.toSeq }
  }

  // Assignment parity result (probed exhaustively, see KMeansPolish
  // scaladoc): R's golden partition (WSS 5711.115 in z-space) is a
  // first-improvement Hartigan-Wong optimum; our Lloyd + steepest-descent
  // H-W polish converges to WSS 5710.815 — strictly BETTER on R's own
  // objective — differing on 7 boundary rows between the economy and
  // performance clusters. Exact row parity would require emulating R's
  // Mersenne-Twister init and its in-row-order first-improvement transfer
  // scan, which SURVEY §5.1's metric-level-parity rule for RNG-bearing ML
  // explicitly declines. So the golden contract here is:
  //   identical data keys, >= 195/205 agreement under the best label
  //   permutation, the 11-car luxury cluster EXACTLY equal, and our
  //   within-cluster SS <= the golden partition's.
  test("golden: k=3 assignments match car_data_with_clusters.csv up to permutation and boundary rows") {
    val (labeled, _) = clustered
    val featNames = sanitize(parseQuotedCsv("/root/reference/car_data_with_clusters.csv")
      ._1.toSeq).filter(n => n != "cluster" && n != "label")
    val collected = labeled.collect().map { r =>
      val fv = featNames.map(n => r.getAs[Any](n) match {
        case d: Double => d; case i: Int => i.toDouble; case l: Long => l.toDouble
      })
      (rowKey(fv), fv, r.getAs[Int]("cluster"))
    }
    val ours = collected.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sorted.toSeq }

    assert(ours.keySet == goldenAssignments.keySet,
      s"feature-tuple keys diverge: ours-only=${(ours.keySet -- goldenAssignments.keySet).take(3)} " +
        s"golden-only=${(goldenAssignments.keySet -- ours.keySet).take(3)}")

    val perms = Seq(1, 2, 3).permutations.toSeq
    val agreements = perms.map { p =>
      val m = Map(1 -> p(0), 2 -> p(1), 3 -> p(2))
      p -> ours.map { case (k, cs) =>
        cs.map(m).sorted.intersect(goldenAssignments(k)).size
      }.sum
    }
    val (bestPerm, bestAgree) = agreements.maxBy(_._2)
    val total = goldenAssignments.values.map(_.size).sum
    info(s"best permutation $bestPerm agrees on $bestAgree/$total rows")
    assert(total == 205)
    assert(bestAgree >= 195,
      s"assignments disagree on ${total - bestAgree} rows (perm $bestPerm)")
    val m = Map(1 -> bestPerm(0), 2 -> bestPerm(1), 3 -> bestPerm(2))

    // the small luxury cluster must match exactly (its 11 members are
    // unambiguous under both optima)
    val luxGolden = goldenAssignments.collect { case (k, cs) if cs.contains(3) => k }.toSet
    val luxOurs = ours.collect { case (k, cs) if cs.map(m).contains(3) => k }.toSet
    assert(luxOurs == luxGolden, "luxury-cluster membership diverges")

    // our partition must be at least as good as R's on R's own objective
    // (z-space total within-cluster SS, same scaling both sides)
    val n = collected.length
    val d = featNames.length - 1 // drop price (not a clustering feature)
    val feats = collected.map(_._2.take(d))
    val mean = Array.tabulate(d)(j => feats.map(_(j)).sum / n)
    val sd = Array.tabulate(d)(j =>
      math.sqrt(feats.map(v => math.pow(v(j) - mean(j), 2)).sum / (n - 1)))
    def z(v: Seq[Double]) = Array.tabulate(d)(j => (v(j) - mean(j)) / sd(j))
    def wssOf(assign: Seq[(Seq[Double], Int)]): Double =
      assign.groupBy(_._2).map { case (_, mem) =>
        val zs = mem.map(x => z(x._1))
        val c = Array.tabulate(d)(j => zs.map(_(j)).sum / zs.length)
        zs.map(zv => zv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).sum
      }.sum
    val ourWss = wssOf(collected.map(r => (r._2, r._3)).toSeq)
    val goldenByKey = goldenAssignments
    val goldenWss = wssOf(collected.map(r => (r._2, goldenByKey(r._1).head)).toSeq)
    info(f"z-space WSS ours=$ourWss%.6f golden=$goldenWss%.6f")
    assert(ourWss <= goldenWss + 1e-6,
      f"our partition is worse than the golden one: $ourWss%.6f > $goldenWss%.6f")
  }

  test("golden: unscaled centers match cluster_centers.csv within tolerance") {
    val (_, centers) = clustered
    val (hdr, rows) = parseQuotedCsv("/root/reference/cluster_centers.csv")
    val golden = rows.map(_.map(_.toDouble).toSeq)
    assert(golden.length == 3 && hdr.length == 34 && centers.forall(_.length == 34))
    // Our cluster ids are ordered by ascending horsepower center exactly
    // like the golden rows, so the mapping is positional. The 7 divergent
    // boundary rows (see assignment test) shift the economy/performance
    // means by up to 7/69 ≈ 0.10 on a dummy proportion and ~2% on the
    // numeric features, so those two centers get 5% relative + 0.11
    // absolute; the luxury cluster has identical membership, so its center
    // must match to float-print precision (1e-9 rel; golden carries 1e-17
    // unscaling noise on zero dummy coords).
    centers.zipWithIndex.foreach { case (c, ci) =>
      val g = golden(ci)
      val (absTol, relTol) = if (ci == 2) (1e-9, 1e-9) else (0.11, 0.05)
      c.zip(g).zipWithIndex.foreach { case ((a, b), coord) =>
        assert(math.abs(a - b) <= absTol + relTol * math.abs(b),
          s"center $ci coord ${hdr(coord)}: ours=$a golden=$b")
      }
    }
  }

  test("clustering: full elbow sweep k=1..15 is monotone with the elbow the reference read at 3") {
    // the reference's full sweep (clustering.R:36-42, nstart=10 converged)
    val t0 = System.nanoTime()
    val rows = CarClusteringPipeline.elbow(mlReady)
      .orderBy("k").collect().map(r => (r.getInt(0), r.getDouble(1)))
    info(f"k=1..15 sweep (10 restarts, converged): ${(System.nanoTime() - t0) / 1e9}%.1f s")
    assert(rows.map(_._1).toSeq == (1 to 15))
    val wss = rows.map(_._2)
    // WSS(1) is exact: total SS about the mean = (n-1)*d on z-scores
    assert(math.abs(wss(0) - 204.0 * 34.0) < 1e-6)
    // converged best-of-10 restarts make the curve monotone non-increasing
    // (single capped fits do NOT — see MLOps.elbow doc)
    assert(wss.zip(wss.tail).forall { case (a, b) => b <= a + 1e-6 },
      s"non-monotone WSS curve: ${wss.mkString(", ")}")
    // WSS(3) lands at the k=3 optimum R reported (5711.1; Lloyd basin 5712.5)
    assert(wss(2) > 5705 && wss(2) < 5716, s"wss(3)=${wss(2)}")
    // the elbow shape the reference eyeballed: the first two drops carry
    // ~3x the mass of the next two — the curve visibly flattens after 3
    val dropTo3 = wss(0) - wss(2)
    val dropTo5 = wss(2) - wss(4)
    assert(dropTo3 >= 2.5 * dropTo5, s"no elbow at 3: $dropTo3 vs $dropTo5")
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

  // ------------------------------------------------------------------
  // Round 9: the reference's two remaining model phases end-to-end on
  // its own 205-row CSV — tune.svm's exact 4×4 grid
  // (BigDataProject.R:370-376) through SvrSmo.gridTune, and the
  // kernel-NB classification (R:351-365) through KdeNb — with
  // metric-level golden bands (the SURVEY §5.1 parity tier for
  // seed-dependent reference steps: R's createDataPartition split is
  // RNG-bound, so exact prediction parity is unattainable by design;
  // the pinned bands bracket the reference's printed performance).

  private lazy val cleanedCar = {
    val df = CarPricePipeline.clean(CarPricePipeline.load(
      spark, "/root/reference/CarPrice_Assignment.csv")).cache()
    df.count(); df
  }

  test("golden: tuned SVR over the reference's 4x4 cost-gamma grid on the 205-row CSV") {
    import graft.operators.{MLOps, SvrSmo}
    // the reference's regression design: log_price ~ all 34 ml features
    val dummies = MLOps.rLevels(cleanedCar, "brand").drop(1).map(v =>
      when(col("brand") === v, 1.0).otherwise(0.0).as(s"brand.$v"))
    val reg = cleanedCar.select(Seq(col("car_id"),
      col("price").cast("double").as("price"),
      col("log_price").cast("double").as("log_price")) ++
      CarPricePipeline.mlFeatures.map(f => col(f).cast("double").as(f)) ++
      dummies: _*)
    val nFeat = reg.columns.length - 3
    val (trainDf, testDf) = MLOps.stratifiedSplit(reg, "car_id", "log_price", 0.8)
    // positional extraction: brand.nissan/brand.Nissan collide under the
    // case-insensitive resolver, so columns must never be re-selected by
    // name past this point (the mlReady comment's rule)
    def mat(df: org.apache.spark.sql.DataFrame): (Array[Array[Double]], Array[Double], Array[Double]) = {
      val rows = df.orderBy("car_id").collect()
      (rows.map(r => Array.tabulate(nFeat)(j => r.getDouble(j + 3))),
        rows.map(_.getDouble(2)), rows.map(_.getDouble(1)))
    }
    val (xTr, yTr, _) = mat(trainDf)
    val (xTe, _, priceTe) = mat(testDf)
    // e1071 svm(scale=TRUE): z-scale features and label from TRAIN stats;
    // constant columns stay unscaled (e1071 warns and skips them)
    val d = nFeat
    val fm = Array.tabulate(d)(j => xTr.map(_(j)).sum / xTr.length)
    val fs = Array.tabulate(d) { j =>
      val v = xTr.map(r => (r(j) - fm(j)) * (r(j) - fm(j))).sum / (xTr.length - 1)
      math.sqrt(v)
    }
    def zrow(r: Array[Double]) = Array.tabulate(d)(j =>
      if (fs(j) > 0) (r(j) - fm(j)) / fs(j) else 0.0)
    val ym = yTr.sum / yTr.length
    val ys = math.sqrt(yTr.map(v => (v - ym) * (v - ym)).sum / (yTr.length - 1))
    // the reference's exact tuning grid (BigDataProject.R:372-373)
    val (best, surface) = SvrSmo.gridTune(xTr.map(zrow), yTr.map(v => (v - ym) / ys),
      costs = Seq(0.1, 1.0, 10.0, 100.0), gammas = Seq(0.01, 0.1, 0.5, 1.0))
    assert(surface.size == 16)
    // winner must beat the untuned default (C=1, gamma=1/dim ~ 0.029 is
    // not on the grid; the nearest grid default (1, 0.01) suffices as
    // the tune-improves control)
    assert(surface((best.c, best.gamma)) <= surface((1.0, 0.01)) + 1e-12)
    // score the held-out test rows, unscale, back-transform to real $
    val predReal = xTe.map(r => math.expm1(SvrSmo.predictOne(best, zrow(r)) * ys + ym))
    val errs = predReal.zip(priceTe).map { case (p, a) => p - a }
    val rmse = math.sqrt(errs.map(e => e * e).sum / errs.length)
    val mae = errs.map(math.abs).sum / errs.length
    val amean = priceTe.sum / priceTe.length
    val r2 = 1.0 - errs.map(e => e * e).sum /
      priceTe.map(a => (a - amean) * (a - amean)).sum
    info(f"tuned SVR: cost=${best.c} gamma=${best.gamma} rmse=$rmse%.1f mae=$mae%.1f r2=$r2%.3f")
    println(f"[golden-svr] cost=${best.c} gamma=${best.gamma} rmse=$rmse%.1f mae=$mae%.1f r2=$r2%.3f nTest=${priceTe.length}")
    // golden band: the reference's tuned SVM explains most price
    // variance on held-out data (measured: cost=10 gamma=0.01,
    // rmse=1331.5, r2=0.956 — the test is seed-deterministic, so the
    // band brackets that point with honest slack)
    assert(r2 >= 0.90, f"tuned SVR r2 $r2%.3f below the reference band")
    assert(rmse <= 2500.0 && mae <= rmse + 1e-9,
      f"tuned SVR rmse $rmse%.1f outside the reference band")
    assert(best.kktViolation <= 1e-6)
  }

  test("golden: kernel NB on the reference's nb_vars classifies price_bucket in band") {
    import graft.operators.KdeNb
    // BigDataProject.R:353 nb_vars (price_bucket + 7 numerics)
    val nbFeatures = Seq("horsepower", "enginesize", "curbweight",
      "citympg", "highwaympg", "carwidth", "carlength")
    val nb = cleanedCar.select(
      (col("car_id") +: col("price_bucket") +: nbFeatures.map(col)): _*)
    // createDataPartition(p=.8) analog on the class label: per-class
    // 80% sample (deterministic seed), remainder tests
    val classes = nb.select("price_bucket").distinct()
      .collect().map(_.getString(0))
    val train = nb.stat.sampleBy("price_bucket",
      classes.map(_ -> 0.8).toMap, 123L).cache()
    val test = nb.join(train.select("car_id"), Seq("car_id"), "left_anti").cache()
    val model = KdeNb.fit(train, nbFeatures, "price_bucket")
    val scored = KdeNb.score(test, model)
    val n = scored.count()
    val hits = scored.filter(col("pred") === col("price_bucket")).count()
    val acc = hits.toDouble / n
    info(f"kernel NB: accuracy $acc%.3f on $n held-out rows")
    println(f"[golden-nb] accuracy=$acc%.3f nTest=$n")
    // golden band: the reference's NB separates the quartile buckets
    // well above the 0.25 uniform baseline
    assert(acc >= 0.70, f"kernel NB accuracy $acc%.3f below the reference band")
    // every class present in test is predicted at least once correctly
    val perClass = scored.groupBy("price_bucket")
      .agg(avg(when(col("pred") === col("price_bucket"), 1.0).otherwise(0.0)).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(perClass.values.forall(_ > 0.0), s"a class never predicted: $perClass")
    train.unpersist(); test.unpersist()
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
