package graft.tools

import graft.pipeline.{CarClusteringPipeline, CarPricePipeline}

/** Dev tool: compare the golden R partition's WSS (in z-space) against our
  * multi-restart Spark k-means objective, all driver-side on the 205x34
  * matrix — decides whether an assignment diff is a worse local optimum on
  * our side or a scaling divergence.
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.session(8)

    // our ml-ready matrix, z-scaled the same way the pipeline does
    val mlReady = CarPricePipeline.mlReady(CarPricePipeline.clean(
      CarPricePipeline.load(spark, "/root/reference/CarPrice_Assignment.csv"))).cache()
    val featNames = {
      val seen = scala.collection.mutable.Map[String, Int]()
      mlReady.columns.filter(_ != "price").map { c =>
        val base = c.replace(".", "_")
        val n = seen.getOrElse(base.toLowerCase, 0)
        seen(base.toLowerCase) = n + 1
        if (n == 0) base else s"${base}__$n"
      }.toSeq
    }

    // golden rows keyed by feature tuple
    def cells(l: String) = l.split(",", -1).map(_.stripPrefix("\"").stripSuffix("\""))
    val lines = scala.io.Source.fromFile("/root/reference/car_data_with_clusters.csv")
      .getLines().toIndexedSeq
    val hdr = cells(lines.head)
    // golden col order: cluster, 34 feats, price, label
    val rows = lines.tail.map(cells)
    val goldenFeat = rows.map(r => (1 until 35).map(i => r(i).toDouble) :+ r(35).toDouble) // 34 feats + price
    val goldenCl = rows.map(_(0).toInt)

    // our matrix rows in the same key space
    val raw = mlReady.toDF(featNames :+ "price": _*)
    val ours = raw.collect().map { r =>
      featNames.map(n => r.getAs[Any](n) match {
        case d: Double => d; case i: Int => i.toDouble; case l: Long => l.toDouble
      }) :+ (r.getAs[Any]("price") match {
        case d: Double => d; case i: Int => i.toDouble; case l: Long => l.toDouble })
    }
    def key(v: Seq[Double]) = v.map(x => f"$x%.4f").mkString("|")
    val ourByKey = ours.groupBy(v => key(v))

    // z-scale (sample sd) from OUR data over the 34 features
    val n = ours.length
    val d = 34
    val mean = Array.tabulate(d)(j => ours.map(_(j)).sum / n)
    val sd = Array.tabulate(d)(j =>
      math.sqrt(ours.map(v => math.pow(v(j) - mean(j), 2)).sum / (n - 1)))
    def z(v: Seq[Double]): Array[Double] =
      Array.tabulate(d)(j => (v(j) - mean(j)) / sd(j))

    // golden partition cost in z-space (centroid = mean of members)
    val byCl = goldenFeat.zip(goldenCl).groupBy(_._2)
    val goldenCost = byCl.map { case (_, members) =>
      val zs = members.map(m => z(m._1))
      val c = Array.tabulate(d)(j => zs.map(_(j)).sum / zs.length)
      zs.map(zv => zv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).sum
    }.sum
    println(f"[cprobe] golden partition WSS (our z-space): $goldenCost%.6f")
    println(s"[cprobe] golden sizes: ${byCl.map { case (k, v) => k -> v.size }.toSeq.sortBy(_._1)}")

    // our model's partition cost
    val (labeled, _) = CarClusteringPipeline.cluster(mlReady, restarts = sys.env.getOrElse("CPROBE_RESTARTS", "10").toInt)
    val ourAssign = labeled.collect().map { r =>
      val fv = featNames.map(nm => r.getAs[Any](nm) match {
        case dd: Double => dd; case i: Int => i.toDouble; case l: Long => l.toDouble
      })
      (fv, r.getAs[Int]("cluster"))
    }
    val ourByCl = ourAssign.groupBy(_._2)
    val ourCost = ourByCl.map { case (_, members) =>
      val zs = members.map(m => z(m._1))
      val c = Array.tabulate(d)(j => zs.map(_(j)).sum / zs.length)
      zs.map(zv => zv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).sum
    }.sum
    println(f"[cprobe] our partition WSS (same z-space):   $ourCost%.6f")
    println(s"[cprobe] our sizes: ${ourByCl.map { case (k, v) => k -> v.length }.toSeq.sortBy(_._1)}")

    // Is the golden partition Lloyd-stable? Run Lloyd from the golden
    // centroids driver-side; count reassignments per sweep.
    val zRows = goldenFeat.map(v => z(v))
    var assign = goldenCl.toArray
    var sweep = 0
    var moved = -1
    while (moved != 0 && sweep < 50) {
      val cents = assign.toSeq.distinct.sorted.map { cl =>
        val zs = zRows.zip(assign).filter(_._2 == cl).map(_._1)
        cl -> Array.tabulate(d)(j => zs.map(_(j)).sum / zs.length)
      }.toMap
      moved = 0
      val next = zRows.zipWithIndex.map { case (zv, i) =>
        val best = cents.minBy { case (_, c) =>
          zv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum }._1
        if (best != assign(i)) moved += 1
        best
      }.toArray
      assign = next
      sweep += 1
      println(s"[cprobe] lloyd sweep $sweep from golden centroids: moved=$moved")
    }
    val agree = assign.zip(goldenCl).count { case (a, b) => a == b }
    println(s"[cprobe] lloyd-converged vs golden agreement: $agree/205")

    if (sys.env.contains("CPROBE_ELBOW")) {
      val t0 = System.nanoTime()
      val wss = CarClusteringPipeline.elbow(mlReady).orderBy("k").collect()
        .map(r => (r.getInt(0), r.getDouble(1)))
      println(f"[cprobe] elbow sweep took ${(System.nanoTime() - t0) / 1e9}%.1f s")
      wss.foreach { case (k, w) => println(f"[cprobe] wss($k%2d) = $w%.2f") }
    }

    // sanity: do the two data matrices agree key-for-key?
    val goldenKeys = goldenFeat.map(v => key(v.take(34) :+ v(34)))
    val missing = goldenKeys.filterNot(ourByKey.contains)
    println(s"[cprobe] golden keys missing from ours: ${missing.size}")
    spark.stop()
  }
}
