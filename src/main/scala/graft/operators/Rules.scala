package graft.operators

import org.apache.spark.ml.fpm.FPGrowth
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Association-rule mining (SURVEY.md §2.10 M12-M14, §2.9 T6), rebuilt on
  * ml.fpm.FPGrowth (distributed FP-Growth ≡ Apriori output at equal
  * thresholds — reference: BigDataProject.R:554-563,
  * associationRules.R:105-111,357-360).
  *
  * Scale shape: FPGrowth is the multi-stage distributed part (item
  * frequency pass + per-partition conditional trees). Everything after —
  * length filters, redundancy prune, interest measures — is DataFrame
  * algebra over the (small) rules/itemsets frames.
  */
object Rules {

  /** Build market-basket transactions: one array<string> of "col=value"
    * items per row (arules transactions analog, associationRules.R:86). */
  def toTransactions(df: DataFrame, cols: Seq[String],
                     out: String = "items"): DataFrame =
    df.withColumn(out, array(cols.map(c =>
      concat_ws("=", lit(c), col(c).cast("string"))): _*))

  /** M12: mine rules at (minSupport, minConfidence) with arules-style
    * minlen/maxlen over antecedent+consequent size. Returns
    * (antecedent, consequent, confidence, lift, support, count). */
  def mine(transactions: DataFrame, itemsCol: String,
           minSupport: Double, minConfidence: Double,
           minLen: Int = 2, maxLen: Int = 10,
           nTransactions: Long = -1L): DataFrame = {
    // Callers that already counted (to cache, to compute minsup) pass n in;
    // recounting here would add one full pass per mining call.
    val n = if (nTransactions >= 0) nTransactions else transactions.count()
    val fp = new FPGrowth().setItemsCol(itemsCol)
      .setMinSupport(minSupport).setMinConfidence(minConfidence)
    val model = fp.fit(transactions)
    model.associationRules
      .withColumn("rule_len", size(col("antecedent")) + size(col("consequent")))
      .filter(col("rule_len").between(minLen, maxLen))
      .withColumn("count", round(col("support") * n, 0).cast("long"))
      .drop("rule_len")
  }

  /** Frequent itemsets with relative support (for measure computation). */
  def freqItemsets(transactions: DataFrame, itemsCol: String,
                   minSupport: Double, nTransactions: Long = -1L): DataFrame = {
    val n = if (nTransactions >= 0) nTransactions else transactions.count()
    val fp = new FPGrowth().setItemsCol(itemsCol).setMinSupport(minSupport)
      .setMinConfidence(0.0)
    fp.fit(transactions).freqItemsets
      .withColumn("rel_support", col("freq") / lit(n.toDouble))
  }

  /** M13 (associationRules.R:121): a rule is redundant iff a rule with a
    * PROPER SUBSET antecedent, same consequent, and >= confidence exists.
    * Self-join on sorted consequent + subset test + anti-join survivors. */
  def pruneRedundant(rules: DataFrame): DataFrame = {
    val r1 = rules
      .withColumn("__a1", sort_array(col("antecedent")))
      .withColumn("__c1", sort_array(col("consequent")))
    val r2 = rules.select(
      sort_array(col("antecedent")).as("__a2"),
      sort_array(col("consequent")).as("__c2"),
      col("confidence").as("__conf2"))
    val redundant = r1.join(r2,
      col("__c1") === col("__c2") &&
        size(col("__a2")) < size(col("__a1")) &&
        size(array_except(col("__a2"), col("__a1"))) === 0 &&
        col("__conf2") >= col("confidence"), "left_semi")
    r1.join(redundant.select(col("__a1").as("__ra"), col("__c1").as("__rc")),
      col("__a1") === col("__ra") && col("__c1") === col("__rc"), "left_anti")
      .drop("__a1", "__c1")
  }

  /** T6 (associationRules.R:201-207): extra interest measures, all
    * closed-form in (supp(A), supp(B), supp(A∪B), N) obtained by joining
    * the rules frame with itemset supports. */
  def withMeasures(rules: DataFrame, itemsets: DataFrame, nTransactions: Long): DataFrame = {
    val suppOf = itemsets.select(sort_array(col("items")).as("__key"),
      col("rel_support"))
    val joined = rules
      .join(suppOf.withColumnRenamed("rel_support", "supp_a"),
        sort_array(col("antecedent")) === col("__key")).drop("__key")
      .join(suppOf.withColumnRenamed("rel_support", "supp_b"),
        sort_array(col("consequent")) === col("__key")).drop("__key")
    val s = col("support"); val sa = col("supp_a"); val sb = col("supp_b")
    val n = lit(nTransactions.toDouble)
    joined
      .withColumn("coverage", sa)
      .withColumn("leverage", s - sa * sb)
      .withColumn("conviction",
        when(col("confidence") === 1.0, lit(Double.PositiveInfinity))
          .otherwise((lit(1.0) - sb) / (lit(1.0) - col("confidence"))))
      .withColumn("cosine", s / sqrt(sa * sb))
      .withColumn("chi_squared",
        n * pow(s - sa * sb, 2) / (sa * sb * (lit(1.0) - sa) * (lit(1.0) - sb)))
      .withColumn("odds_ratio", {
        val denom = (sa - s) * (sb - s)
        when(denom === 0, lit(Double.PositiveInfinity))
          .otherwise(s * (lit(1.0) - sa - sb + s) / denom)
      })
  }

  /** Recover the exact integer count basis (pc = supp count of A∪B,
    * ac = antecedent count, cc = consequent count) from a mined rules
    * frame. FPGrowth emits only double ratios + `count`; the ratios are
    * single divisions of the underlying longs, so the longs are
    * recoverable exactly (relative error of a few ulp ≪ 1/2). Integer
    * basis → measures can be computed with integer/fixed-op-tree math
    * that is bit-identical across engines (the oracle-parity trick). */
  def withCountBasis(rules: DataFrame, n: Long): DataFrame =
    rules
      .withColumn("__pc", col("count"))
      .withColumn("__ac", round(col("count") / col("confidence")).cast("long"))
      .withColumn("__cc",
        round(col("confidence") * lit(n.toDouble) / col("lift")).cast("long"))

  /** M14 (associationRules.R:349-370): re-mine per segment value.
    *
    * Scale note: this mirrors the reference's own per-segment loop — one
    * FPGrowth fit per distinct segment, driven serially from the driver.
    * Each fit is itself distributed, but segment COUNT is a wall-clock
    * multiplier: fine for a handful of market segments, wrong for
    * thousands of groups — there, use [[segmentEncodedMine]], which mines
    * ALL segments in one fit and matches this operator's output exactly
    * (identity pinned in PropertySpec). */
  def perGroupMine(df: DataFrame, groupCol: String, itemCols: Seq[String],
                   minSupport: Double, minConfidence: Double,
                   maxGroups: Int = 256): DataFrame = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import FitPool.ec
    // cardinality guard (the requirePairBudget discipline): the driver
    // collect below is bounded by maxGroups+1 rows, and past the cap the
    // operator refuses loudly naming its scale twin instead of silently
    // scheduling thousands of serial fits
    val groups = df.select(groupCol).distinct().limit(maxGroups + 1)
      .collect().map(_.get(0).toString).sorted
    require(groups.length <= maxGroups,
      s"perGroupMine: more than $maxGroups distinct '$groupCol' groups — " +
        "one FPGrowth fit per group is a wall-clock multiplier that does " +
        "not scale to that; use segmentEncodedMine (one fit, identical " +
        "output) or raise maxGroups")
    // one FPGrowth fit per segment, submitted concurrently on the BOUNDED
    // FitPool: each fit is an independent job chain and single fits
    // underutilize the cluster, but in-flight fits are capped so many
    // segments queue as runnables, not blocked threads (union order stays
    // deterministic — futures are collected in sorted-group order)
    Await.result(Future.sequence(groups.toSeq.map { g => FitPool.submit {
      val tx = toTransactions(df.filter(col(groupCol) === g), itemCols)
      mine(tx, "items", minSupport, minConfidence)
        .withColumn("segment", lit(g))
    } }), Duration.Inf).reduce(_.unionByName(_))
  }

  /** M14 at scale — the variant [[perGroupMine]]'s scaladoc names: encode
    * the segment value into every item and mine ONCE. Baskets from
    * different segments then share no items, so the single global
    * FP-Growth fit factors exactly into the independent per-segment fits:
    * every itemset lives entirely inside one segment, its global count
    * equals its within-segment count, and confidence (a ratio of two such
    * counts) is identical bit-for-bit. Segment-relative support and lift
    * are restored afterwards from the recovered integer count basis (the
    * [[withCountBasis]] trick) and the per-segment transaction counts —
    * mirroring FPGrowth's own division order so the doubles match the
    * per-segment fits exactly.
    *
    * Thresholds: per-segment mining keeps itemsets with count >=
    * ceil(minSupport·n_g); the single fit mines at the loosest of those
    * (the smallest segment's) and re-applies each segment's integer
    * minCount afterwards. Confidence needs no rescaling, so FPGrowth's
    * own minConfidence gate already matches.
    *
    * Scale shape: one fit regardless of segment count — segment
    * cardinality stops being a wall-clock multiplier. The cost is mining
    * large segments at the smallest segment's threshold; with heavily
    * skewed segment sizes, bucket segments by magnitude and run one fit
    * per bucket. Items must not contain U+0001 (the tag separator). */
  def segmentEncodedMine(df: DataFrame, groupCol: String, itemCols: Seq[String],
                         minSupport: Double, minConfidence: Double,
                         minLen: Int = 2, maxLen: Int = 10): DataFrame = {
    val sep = "\u0001"
    val sp = df.sparkSession
    import sp.implicits._
    val segN = df.groupBy(col(groupCol).cast("string").as("segment"))
      .count().withColumnRenamed("count", "__n")
    val totalN = segN.agg(sum(col("__n"))).head().getLong(0)
    require(totalN > 0, "segmentEncodedMine: empty input")
    val nMin = segN.agg(min(col("__n"))).head().getLong(0)
    // ceil(g·totalN) == ceil(minSupport·nMin) for g just under the ratio:
    // the global fit keeps exactly the itemsets any segment might need
    val minCountMin = math.max(math.ceil(minSupport * nMin), 1.0)
    val globalMinSup = (minCountMin - 0.5) / totalN
    val tagged = toTransactions(df, itemCols).withColumn("items",
      transform(col("items"),
        x => concat(col(groupCol).cast("string"), lit(sep), x)))
    val fp = new FPGrowth().setItemsCol("items")
      .setMinSupport(globalMinSup).setMinConfidence(minConfidence)
    val rules = fp.fit(tagged).associationRules
    rules
      .withColumn("segment", substring_index(element_at(col("antecedent"), 1), sep, 1))
      .withColumn("antecedent",
        transform(col("antecedent"), x => substring_index(x, sep, -1)))
      .withColumn("consequent",
        transform(col("consequent"), x => substring_index(x, sep, -1)))
      .withColumn("rule_len", size(col("antecedent")) + size(col("consequent")))
      .filter(col("rule_len").between(minLen, maxLen)).drop("rule_len")
      // integer count basis from the global ratios (exact: single
      // divisions of longs round-trip within a few ulp)
      .withColumn("__pc", round(col("support") * totalN).cast("long"))
      .withColumn("__cc",
        round(col("confidence") * lit(totalN.toDouble) / col("lift")).cast("long"))
      .join(broadcast(segN), "segment")
      // each segment's own FPGrowth minCount gate, in integers
      .filter(col("__pc") >= ceil(lit(minSupport) * col("__n")))
      // FPGrowth's division order: support = freq / n; lift = conf / (freqB / n)
      .withColumn("support", col("__pc").cast("double") / col("__n"))
      .withColumn("lift",
        col("confidence") / (col("__cc").cast("double") / col("__n")))
      .withColumn("count", col("__pc"))
      .select("antecedent", "consequent", "confidence", "lift", "support",
        "count", "segment")
  }
}
