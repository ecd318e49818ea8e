package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source-mixing / downsampling operators for training-data pipelines:
  * cap over-represented sources (domains, crawls, shards) at a budget
  * per key, deterministically — re-running the pipeline must select the
  * SAME rows (no RNG; selection is a pure function of the id).
  *
  * Two tiers, same contract as the dedup operators:
  *
  *  - [[capPerKeyHash]] — the 100-TB shape. Keep a row when its Knuth
  *    multiplicative hash falls under `cap/n_key` of the hash range: one
  *    count aggregate + one broadcast join + a codegen'd integer
  *    comparison. No sort, no window, immune to hot-key skew (a
  *    100-billion-row source costs the same per row as a tiny one).
  *    The kept count is binomial around the cap (exact-cap selection is
  *    fundamentally a top-k; see below).
  *  - [[capPerKeyExact]] — exactly min(n, cap) rows per key via a
  *    hash-ranked row_number window. One shuffle on the key; the whole
  *    key's rows pass through one partition, so this is the SMALL-key
  *    tier (eval sets, per-language caps in the thousands) — for
  *    over-represented sources at corpus scale use the hash tier.
  *
  * The selection hash is the q71 curation sampler's Knuth multiplicative
  * hash ((id * 2654435761) mod 2^32) — plain integer SQL both engines
  * compute bit-identically (ids must stay below ~3.4e9 to avoid BIGINT
  * overflow in the product; 64-bit corpora would switch the constant to
  * a splitmix-style 64-bit mix).
  */
object Sampling {

  /** Knuth multiplicative hash of an id column into [0, 2^32).
    *
    * GOOD for threshold selection (`hash < t` consumes the whole value)
    * — NOT for modulo bucketing: 2654435761 ≡ 1 (mod 16), so
    * `selectionHash(id) mod B` collapses to `id mod B` for power-of-two
    * B ≤ 16, and low bits stay poorly mixed for any small B (a multiply
    * only propagates bits upward). Bucketing callers use [[mixedHash]]. */
  def selectionHash(id: Column): Column =
    pmod(id * lit(2654435761L), lit(4294967296L))

  /** [[selectionHash]] plus a lowbias32-style finalizing mix (two
    * xorshift-multiply rounds + a closing xorshift) so EVERY output bit
    * depends on every input bit — `mixedHash(id) mod B` is uniform for
    * power-of-two B, unlike the bare Knuth multiply (see above). All
    * intermediates stay < 2^59, and xor/shift/multiply/mod on
    * non-negative BIGINTs are bit-identical across engines (the DuckDB
    * oracles spell the same rounds as `xor(h, h // 65536)`). */
  def mixedHash(id: Column): Column = {
    val h0 = selectionHash(id)
    val h1 = pmod(h0.bitwiseXOR(shiftright(h0, 16)) * lit(73244475L), lit(4294967296L))
    val h2 = pmod(h1.bitwiseXOR(shiftright(h1, 16)) * lit(73244475L), lit(4294967296L))
    h2.bitwiseXOR(shiftright(h2, 16))
  }

  /** Hash-threshold cap: keep rows whose selection hash falls below
    * cap/n_key of the range. Deterministic, one narrow shuffle (the
    * per-key count), broadcast-joined back, no window. */
  def capPerKeyHash(df: DataFrame, keyCol: String, idCol: String, cap: Long): DataFrame = {
    val counts = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"))
      // integer threshold: cap * 2^32 / n, floored — both engines agree.
      // DECIMAL(38,0) product: a BIGINT `cap * 2^32` wraps once cap hits
      // 2^31 (row counts in the billions are routine at corpus scale);
      // the decimal product is exact to 10^38 and `DIV` truncates exactly
      .withColumn("__t",
        expr(s"CAST((CAST($cap AS DECIMAL(38,0)) * 4294967296) DIV __n AS BIGINT)"))
    df.join(broadcast(counts), Seq(keyCol))
      .filter(selectionHash(col(idCol)) < col("__t"))
      .drop("__n", "__t")
  }

  /** Exact cap: the min(n, cap) rows with the smallest selection hash
    * (ties broken by id — total order, so re-runs pick identical rows). */
  def capPerKeyExact(df: DataFrame, keyCol: String, idCol: String, cap: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(selectionHash(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Inverse-sqrt source flattening — temperature resampling of a skewed
    * source mixture toward the rarest source (the T5/XLM-R style
    * mixture-flattening step, fixed at temperature 2): each key keeps a
    * deterministic sqrt(n_min / n_key) fraction of its rows, so a source
    * 100x over-represented ends up only 10x over-represented, and the
    * rarest source is kept whole.
    *
    * Temperature is FIXED at 2 because IEEE-754 `sqrt` is correctly
    * rounded — the keep-threshold is bit-identical on every engine (a
    * general n^(1/T) needs `pow`, whose last ulp is libm-specific; a
    * boundary-sitting row could then flip between engines).
    *
    * Scale shape: one count aggregate on the key column (map-side
    * combined, key-cardinality rows), checkpointed so its single-row min
    * and the per-key thresholds don't re-scan the corpus, then one
    * broadcast join + a codegen'd integer comparison per row. No sort,
    * no window, no second corpus scan. */
  def inverseSqrtFlatten(df: DataFrame, keyCol: String, idCol: String,
                         staging: Staging.Mode = Staging.Local): DataFrame = {
    val counts = staging(df.groupBy(col(keyCol)).agg(count(lit(1)).as("__n")))
    val thr = counts
      .crossJoin(broadcast(counts.agg(min(col("__n")).as("__m"))))
      .withColumn("__t",
        floor(lit(4294967296L) * sqrt(col("__m").cast("double") / col("__n"))).cast("long"))
      .select(col(keyCol), col("__t"))
    df.join(broadcast(thr), Seq(keyCol))
      .filter(selectionHash(col(idCol)) < col("__t"))
      .drop("__t")
  }

  /** Deterministic shard assignment for training data loaders: every row
    * gets a (shard, ord) address — shard from the MIXED hash's low
    * bits, ord a dense 1..n_shard rank in hash order — so S readers can
    * each scan their shard in a stable pseudo-random order, and a re-run
    * (or a resumed job) sees the IDENTICAL order. No RNG, no global
    * sort: the only wide op is a row_number window PARTITIONED BY shard
    * (S-way parallel; size S so shards fit a partition — thousands at
    * corpus scale). */
  def shardAssign(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col("__pos"), col(idCol))
    df.withColumn("__pos", mixedHash(col(idCol)))
      .withColumn("shard", pmod(col("__pos"), lit(shards.toLong)).cast("int"))
      .withColumn("ord", row_number().over(w).cast("long"))
      .drop("__pos")
  }

  /** Deterministic negative sampling for contrastive training: for each
    * anchor, pick `k` pseudo-uniform documents from the candidate pool,
    * never the anchor itself, with NO RNG — the picks are a pure function
    * of (anchor, slot), so a re-run (or a DuckDB oracle) selects the SAME
    * negatives.
    *
    * Draws are WITH replacement (slots are independent — the word2vec
    * negative-sampling semantic): two slots of one anchor can land on
    * the same negative with probability ~k²/2N, so an anchor gets k
    * draws, not necessarily k DISTINCT negatives. Consumers needing
    * distinct sets oversample (k' > k) and dedupe downstream.
    *
    * Scale shape — sampling as an equi-join, no global sort anywhere:
    *  1. Every candidate hashes to a bucket (`selectionHash(id) mod B`)
    *     and gets a rank within its bucket (row_number partitioned by
    *     bucket — B-way parallel, each partition ~N/B rows). `B` is the
    *     parallelism/size knob: size it ~N/50k so per-bucket sorts stay
    *     in-memory at 100 TB.
    *  2. Bucket sizes are a B-row aggregate over the id column only
    *     (column-pruned scan, map-side combined) — broadcast to probes.
    *  3. A probe (anchor, slot) hashes to (bucket, rank): bucket from the
    *     low bits, rank from the high bits mod the bucket size. The pick
    *     is then a plain shuffle equi-join on (bucket, rank) — one
    *     corpus-wide shuffle, one probe-side shuffle, both on uniform
    *     keys (the hash ring is skew-free by construction).
    *  4. Self-collisions (the probe drew its own anchor) take the NEXT
    *     candidate in bucket (pos, id) order — `lead` with wrap to the
    *     bucket's first, precomputed per candidate in the same window, so
    *     the skip costs nothing per probe. A 1-candidate bucket whose
    *     only member IS the anchor drops the probe (deterministic on both
    *     engines; vanishing probability once N/B >> 1).
    *
    * Hash domain: probe mixing computes (anchor*131 + slot) mod 2^31
    * before the Knuth multiply, keeping every intermediate < 2^63 —
    * anchor ids up to 2^63/131 are safe. Candidate ids must stay below
    * ~3.4e9 (the [[selectionHash]] caveat).
    *
    * Returns (anchor, slot, neg_id), at most k rows per anchor. */
  def negativeSample(corpus: DataFrame, anchors: DataFrame, idCol: String,
                     k: Int, buckets: Int = 64): DataFrame = {
    val b = buckets.toLong
    val cand0 = corpus.select(col(idCol).cast("long").as("neg_id"))
      .withColumn("__pos", mixedHash(col("neg_id")))
      .withColumn("__b", pmod(col("__pos"), lit(b)))
    val w = Window.partitionBy("__b").orderBy(col("__pos"), col("neg_id"))
    val cand = cand0
      .withColumn("__rn", row_number().over(w).cast("long"))
      // successor in bucket order, wrapping to the bucket's first member
      .withColumn("__next", coalesce(lead(col("neg_id"), 1).over(w),
        first(col("neg_id")).over(w)))
      .drop("__pos")
    val sizes = cand0.groupBy("__b").agg(count(lit(1)).as("__n"))
    val probes = anchors.select(col(idCol).cast("long").as("anchor"))
      .withColumn("slot", explode(expr(s"sequence(1, $k)")))
      .withColumn("__h", mixedHash(
        pmod(col("anchor") * lit(131L) + col("slot"), lit(2147483648L))))
      .withColumn("__b", pmod(col("__h"), lit(b)))
      .join(broadcast(sizes), Seq("__b"))
      .withColumn("__rn", pmod(expr(s"__h DIV $b"), col("__n")) + lit(1L))
    probes.join(cand, Seq("__b", "__rn"))
      .withColumn("__pick",
        when(col("neg_id") === col("anchor"), col("__next")).otherwise(col("neg_id")))
      .filter(col("__pick") =!= col("anchor"))
      .select(col("anchor"), col("slot").cast("int").as("slot"),
        col("__pick").as("neg_id"))
  }

  /** Budget-weighted mixture sampling WITH repeat factors — the
    * training-mixture materializer (the LLaMA/Pile recipe shape): given
    * per-source target weights and a total row budget, each source
    * contributes `need_s = floor(budget * w_s / Σw)` rows, UP-sampled by
    * whole-corpus repeats when the source is smaller than its share and
    * DOWN-sampled when larger. Sources absent from `weights` are
    * dropped (weight 0).
    *
    * One deterministic formula covers both directions. With `n_s` the
    * source's row count, every row gets
    *
    *   copies = need_s DIV n_s  +  (1 if selectionHash(id) < t_s else 0),
    *   t_s    = ((need_s MOD n_s) * 2^32) DIV n_s
    *
    * and the output repeats the row as `epoch` = 1..copies. When
    * need_s < n_s the DIV term is 0 and this IS the hash-threshold
    * down-sample ([[capPerKeyHash]]'s selection, binomial around
    * need_s); when need_s > n_s every row appears `need DIV n` times
    * and the hash picks the remainder — re-runs select the SAME rows
    * and the SAME copy counts (pure function of the id, no RNG).
    *
    * Scale shape: one count aggregate on the key column (map-side
    * combined), a broadcast join of the key-cardinality needs table,
    * then a codegen'd integer comparison + a bounded `sequence` explode
    * per row. No sort, no window, no corpus shuffle. `maxEpochs` guards
    * the explode: a tiny source given a huge weight would otherwise
    * amplify by need/n unbounded — refuse loudly instead of silently
    * materializing it (the check is one aggregate over the
    * key-cardinality frame, not a corpus action).
    *
    * Cross-engine determinism: `budget * w_s / Σw` is two correctly-
    * rounded IEEE-754 ops (bit-identical in DuckDB), everything after
    * is integer SQL; the `copies >= 1` filter runs BEFORE the explode
    * because Spark's `sequence(1, 0)` counts DOWN (step inference)
    * while SQL `generate_series(1, 0)` is empty.
    *
    * `massCol`: when set, the budget and the per-source masses are in
    * that column's units (TOKENS — the unit real mixtures budget in)
    * instead of rows: n_s = Σ mass over the source, need_s the
    * source's token share, epochs whole-corpus repeats as before, and
    * the hash remainder picks rows totalling ~the remaining token mass
    * (binomial in mass — the hash is independent of the row's size).
    * The column must be a non-negative integer per row. */
  def mixtureSample(df: DataFrame, keyCol: String, idCol: String,
                    weights: Map[String, Double], budget: Long,
                    maxEpochs: Int = 100,
                    massCol: String = "",
                    staging: Staging.Mode = Staging.Local): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0.0),
      "mixture weights must be non-negative and non-empty")
    val spark = df.sparkSession
    import spark.implicits._
    val wSum = weights.values.sum
    require(wSum > 0.0, "mixture weights must not all be zero")
    val wTab = weights.toSeq.toDF(keyCol, "__w")
    // staged: the key-cardinality needs table feeds both the epoch
    // guard (one aggregate action) and the broadcast join — without
    // staging each would re-scan the corpus for the counts
    val mass = if (massCol.isEmpty) count(lit(1)) else sum(col(massCol).cast("long"))
    val needs = staging(df.groupBy(col(keyCol))
      .agg(mass.as("__n"))
      .join(broadcast(wTab), Seq(keyCol)) // inner: unweighted sources drop
      .withColumn("__need",
        floor(lit(budget.toDouble) * col("__w") / lit(wSum)).cast("long"))
      .withColumn("__e", expr("__need DIV __n"))
      // remainder threshold in DECIMAL(38,0): with massCol in TOKEN
      // units a per-source mass n_s >= 2^31 is the NORM, and a BIGINT
      // `r * 2^32` then wraps negative (non-ANSI) or throws (ANSI) —
      // the decimal product is exact (r < n < 2^63, so r*2^32 < 2^95
      // < 10^38) and `DIV` truncates exactly, no rounding edge
      .withColumn("__t", remainderThreshold))
    val worst = needs.agg(coalesce(max("__e"), lit(0L))).head().getLong(0)
    require(worst <= maxEpochs,
      s"mixture up-samples a source ${worst}x (> maxEpochs=$maxEpochs): " +
        "a tiny source carries too large a weight for this budget — " +
        "raise maxEpochs deliberately or fix the weights")
    epochExplode(df, keyCol, idCol, needs)
  }

  /** `((__need % __n) * 2^32) DIV __n` computed in DECIMAL(38,0) so the
    * product cannot wrap when a source's mass reaches 2^31 (token-unit
    * masses in the billions are the normal case). Exact: the remainder
    * is < __n < 2^63, so the product is < 2^95 < 10^38, and Spark's
    * integral `DIV` on decimals truncates without intermediate rounding. */
  private val remainderThreshold: Column =
    expr("CAST((CAST(__need % __n AS DECIMAL(38,0)) * 4294967296) DIV __n AS BIGINT)")

  /** Shared materializer for the per-source-budget samplers: `needs`
    * is the key-cardinality frame (keyCol, __n, __e, __t) — broadcast
    * it, compute copies = __e + the hash-remainder pick, repeat each
    * row as epoch = 1..copies. The `copies >= 1` filter runs BEFORE
    * the explode (Spark's `sequence(1, 0)` counts DOWN while SQL
    * `generate_series(1, 0)` is empty). */
  private def epochExplode(df: DataFrame, keyCol: String, idCol: String,
                           needs: DataFrame): DataFrame =
    df.join(broadcast(needs.select(col(keyCol), col("__e"), col("__t"))), Seq(keyCol))
      .withColumn("__c",
        col("__e") + when(selectionHash(col(idCol)) < col("__t"), 1L).otherwise(0L))
      .filter(col("__c") >= 1L)
      .withColumn("epoch", explode(expr("sequence(1L, __c)")))
      .drop("__e", "__t", "__c")

  /** UniMax epoch-capped budget allocation (Chung et al. '23): spread a
    * total budget as UNIFORMLY as possible across sources, never
    * up-sampling any source past `epochCap` whole-corpus repeats — the
    * fairness-first alternative to [[mixtureSample]]'s fixed weights
    * (hand weights over-sample head sources; UniMax gives every source
    * an equal share until its epoch cap binds, then waterfills the
    * excess into the sources that still have headroom).
    *
    * The waterfill, exactly and in integers: with `n_s` the source's
    * mass (rows, or Σ `massCol`) and `cap_s = epochCap · n_s`, sort
    * sources ascending by (cap, key). The capped set is a PREFIX of
    * that order (a source smaller than the fair share implies every
    * smaller source is too): prefix length
    *
    *   p = max { j : cap_j · (k − j) ≤ budget − cum_j }   (0 if none),
    *
    * with `cum_j` the prefix cap sum — each capped source contributes
    * its whole corpus epochCap times; the `m = k − p` uncapped sources
    * each get `need = (budget − cum_p) DIV m`. Rows then materialize
    * through the same copies/epoch formula as [[mixtureSample]]
    * ([[epochExplode]]). All-integer comparisons — bit-identical in
    * the DuckDB oracle — and deterministic (hash of the id, no RNG).
    *
    * If `budget ≥ epochCap · Σ n_s` EVERY source caps (p = k): the
    * output is exactly epochCap full corpus repeats and the shortfall
    * is deliberately unallocated — raising repeats past the cap is
    * the failure mode the operator exists to prevent.
    *
    * Scale shape: one mass aggregate on the key column (map-side
    * combined), the waterfill windows run over the KEY-CARDINALITY
    * frame (k rows, one partition — k is the source count, never
    * corpus-sized), a 1-row prefix aggregate (same bounded-action
    * shape as mixtureSample's epoch guard), then one broadcast join +
    * a codegen'd comparison + a bounded explode per row. No corpus
    * shuffle, no corpus window. The explode needs no separate guard:
    * capped sources repeat exactly epochCap times and uncapped needs
    * sit strictly below their cap, so copies ≤ epochCap by
    * construction. */
  def unimaxSample(df: DataFrame, keyCol: String, idCol: String,
                   budget: Long, epochCap: Int,
                   massCol: String = "",
                   staging: Staging.Mode = Staging.Local): DataFrame = {
    require(budget >= 0L, s"budget must be non-negative: $budget")
    require(epochCap >= 1, s"epochCap must be >= 1: $epochCap")
    val mass = if (massCol.isEmpty) count(lit(1)) else sum(col(massCol).cast("long"))
    val wAsc = Window.orderBy(col("__cap"), col(keyCol))
    val stats = staging(df.groupBy(col(keyCol)).agg(mass.as("__n"))
      .withColumn("__cap", col("__n") * lit(epochCap.toLong))
      .withColumn("__j", row_number().over(wAsc).cast("long"))
      .withColumn("__cum", sum(col("__cap")).over(
        wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__k", count(lit(1)).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("__flag",
        when(col("__j") < col("__k"),
          col("__cap") * (col("__k") - col("__j")) <= lit(budget) - col("__cum"))
          .otherwise(col("__cum") <= lit(budget))))
    // prefix aggregate: p and its cap sum (cum is increasing and the
    // flagged set is a prefix, so max-over-flagged reads both)
    val pr = stats.agg(
      coalesce(max(when(col("__flag"), col("__j"))), lit(0L)),
      coalesce(max(when(col("__flag"), col("__cum"))), lit(0L)),
      coalesce(max(col("__k")), lit(0L))).head()
    val (p, cump, k) = (pr.getLong(0), pr.getLong(1), pr.getLong(2))
    val needs = stats
      .withColumn("__need",
        when(col("__j") <= lit(p), col("__cap"))
          .otherwise(lit((budget - cump) / math.max(k - p, 1L))))
      .withColumn("__e", expr("__need DIV __n"))
      .withColumn("__t", remainderThreshold) // see mixtureSample: decimal, 2^31-safe
    epochExplode(df, keyCol, idCol, needs)
  }

  /** Keep the best `frac` of each source by score — the quality-pareto
    * selection step (score with a quality classifier, keep the top
    * slice per domain so no domain is judged by another's scale).
    * EXACT tier: `ceil(n_s * frac)` rows per key, highest score first,
    * ties broken by id (total order — re-runs and oracles pick
    * identical rows). One row_number window partitioned by key: the
    * whole key's rows pass through one partition, so this is the
    * SMALL-key tier, same caveat as [[capPerKeyExact]].
    *
    * For corpus-scale keys use [[topFractionByScoreApprox]]: an
    * approx-quantile threshold + a stateless filter — no window, no
    * sort, kept count binomial around the target. */
  def topFractionByScore(df: DataFrame, keyCol: String, scoreCol: String,
                         idCol: String, frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1]: $frac")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__keep", ceil(col("__n").cast("double") * lit(frac)).cast("long"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    df.join(broadcast(counts), Seq(keyCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__keep"))
      .drop("__n", "__keep", "__rn")
  }

  /** The 100-TB tier of [[topFractionByScore]]: per-key score threshold
    * from one `approx_percentile` pass (relative error `eps`), then a
    * stateless `score >= threshold` filter — no window, no per-key
    * sort, hot keys cost the same per row as small ones. Kept count is
    * approximate (the sketch's rank error around the cut), which is the
    * right trade at corpus scale; the exact tier exists for eval-sized
    * keys and for oracles. */
  def topFractionByScoreApprox(df: DataFrame, keyCol: String,
                               scoreCol: String, frac: Double,
                               eps: Double = 0.001): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1]: $frac")
    // boundary short-circuits so the tiers agree where the sketch
    // can't: at frac=0 the percentile is the per-key max and the
    // `>=` filter would keep every row TIED at the max (the exact
    // tier keeps ceil(n*0)=0); at frac=1 keep everything without a
    // sketch pass
    if (frac == 0.0) return df.limit(0)
    if (frac == 1.0) return df
    val thr = df.groupBy(col(keyCol))
      .agg(expr(s"approx_percentile($scoreCol, ${1.0 - frac}, ${math.ceil(1.0 / eps).toInt})")
        .as("__thr"))
    df.join(broadcast(thr), Seq(keyCol))
      .filter(col(scoreCol) >= col("__thr"))
      .drop("__thr")
  }
}
