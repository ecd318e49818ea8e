package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hartigan-Wong refinement of a Lloyd k-means partition.
  *
  * R's `kmeans()` (the reference's clustering operator, clustering.R:67)
  * is Hartigan-Wong: it moves single points between clusters whenever
  *
  *   n_i/(n_i-1) * d(x, c_i)^2  >  n_j/(n_j+1) * d(x, c_j)^2
  *
  * (the exact SS change of removing x from its cluster i vs adding it to
  * j, accounting for the centroid shift). Lloyd fixed points are NOT
  * Hartigan-Wong fixed points: on the reference data Lloyd converges to a
  * partition 1.4 SS units worse than R's from every one of 100 random
  * inits, while R's partition is reachable from Lloyd's by ~a dozen
  * single-point moves. This operator closes that gap distributedly.
  *
  * Scale shape: the move criterion needs only the point's vector and the
  * k centroid sufficient statistics (n_c, sum_c) — k*(d+1) doubles held on
  * the driver and embedded as literals. Each iteration is ONE distributed
  * pass (scan + TakeOrdered(1)) that finds the globally best move; the
  * driver applies it to the stats in O(d). Moves-so-far ride along as a
  * broadcast-sized map literal. Cost = one pass per move, so `maxMoves`
  * bounds the extra scans; polish is a convergence refinement — at 100 TB
  * run it with a small budget (or 0) since Lloyd's optimum is already
  * within a fraction of a percent, and the point of the operator is exact
  * small-data parity with the reference.
  */
object KMeansPolish {

  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  /** Refine `clusterCol` (any int cluster ids) by steepest-descent
    * Hartigan-Wong single-point moves. `assigned` MUST be cached by the
    * caller (it is scanned once per move) and `idCol` must be a stable
    * unique long. Returns (frame with updated clusterCol, final per-cluster
    * stats: id -> (n, sum vector)). */
  def polish(assigned: DataFrame, idCol: String, vecCol: String,
             clusterCol: String, maxMoves: Int = 200,
             eps: Double = 1e-9): (DataFrame, Map[Int, (Long, Array[Double])]) = {
    val d = assigned.select(size(col(vecCol))).limit(1).head.getInt(0)

    // one pass: per-cluster count + element-wise vector sums
    val statCols = count(lit(1)).as("__n") +:
      (0 until d).map(i => sum(element_at(col(vecCol), i + 1)).as(s"__s$i"))
    val stats = scala.collection.mutable.Map[Int, (Long, Array[Double])]()
    assigned.groupBy(col(clusterCol).cast("int").as("__c"))
      .agg(statCols.head, statCols.tail: _*).collect().foreach { r =>
        stats(r.getInt(0)) = (r.getLong(1),
          Array.tabulate(d)(i => r.getDouble(2 + i)))
      }
    val clusters = stats.keys.toSeq.sorted

    var moves = Map[Long, Int]()
    def curCluster: Column =
      if (moves.isEmpty) col(clusterCol).cast("int")
      else coalesce(element_at(typedLit(moves), col(idCol)),
        col(clusterCol).cast("int"))

    var iter = 0
    var done = false
    while (iter < maxMoves && !done) {
      val cl = curCluster
      val x2 = dot(col(vecCol), col(vecCol))
      val dist2 = clusters.map { j =>
        val (nj, sj) = stats(j)
        val cj = sj.map(_ / nj)
        val cn2 = cj.map(x => x * x).sum
        j -> (x2 - lit(2.0) * dot(col(vecCol), typedLit(cj.toSeq)) + lit(cn2))
      }.toMap
      // SS released by removing x from its own cluster (n=1 -> never move)
      val ownGain = clusters.tail.foldLeft(
        when(cl === clusters.head, ownTerm(stats, clusters.head, dist2))) {
        (acc, j) => acc.when(cl === j, ownTerm(stats, j, dist2))
      }
      // cheapest destination: argmin over j != cl of n_j/(n_j+1) * d_j^2
      val cand = array_min(array(clusters.map { j =>
        val (nj, _) = stats(j)
        val pen = lit(nj / (nj + 1.0)) * dist2(j)
        when(cl === j, struct(lit(Double.MaxValue).as("p"), lit(j).as("j")))
          .otherwise(struct(pen.as("p"), lit(j).as("j")))
      }: _*))
      val best = assigned.select(col(idCol).as("__id"), cl.as("__from"),
          cand.getField("j").as("__to"),
          (ownGain - cand.getField("p")).as("__g"),
          col(vecCol).as("__v"))
        .orderBy(desc("__g"), asc("__id")).limit(1).head()
      if (best.getDouble(3) <= eps) done = true
      else {
        val id = best.getLong(0); val from = best.getInt(1); val to = best.getInt(2)
        val v = best.getSeq[Double](4)
        val (nf, sf) = stats(from)
        stats(from) = (nf - 1, sf.zip(v).map { case (a, b) => a - b })
        val (nt, st) = stats(to)
        stats(to) = (nt + 1, st.zip(v).map { case (a, b) => a + b })
        moves += id -> to
        iter += 1
      }
    }
    val out =
      if (moves.isEmpty) assigned
      else assigned.withColumn(clusterCol,
        coalesce(element_at(typedLit(moves), col(idCol)),
          col(clusterCol).cast("int")))
    (out, stats.toMap)
  }

  private def ownTerm(stats: scala.collection.Map[Int, (Long, Array[Double])],
                      j: Int, dist2: Map[Int, Column]): Column = {
    val (nj, _) = stats(j)
    if (nj <= 1L) lit(Double.NegativeInfinity)
    else lit(nj / (nj - 1.0)) * dist2(j)
  }
}
