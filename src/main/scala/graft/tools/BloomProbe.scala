package graft.tools

import graft.Tables
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Dev probe: the bloom decontamination tier's claim at the scale it
  * exists for — a benchmark gram set TOO BIG TO BROADCAST, where the
  * exact tier's join degrades to a corpus-wide shuffle of every
  * exploded gram.
  *
  * Usage: runMain graft.tools.BloomProbe <sfDir> [benchDocs] [copies]
  *
  * Fixture: `benchDocs` synthetic benchmark documents of 40 unique
  * tokens each (~36 distinct 5-grams per doc — 50 k docs ≈ 1.8 M grams,
  * the eval-suite-union scale), disjoint from the corpus vocabulary
  * except for a planted slice: corpus docs with doc_id % 7 == 3 append
  * the first 5 tokens of their (doc_id mod benchDocs)-th benchmark doc.
  * `copies` id-shifts the corpus for the ladder.
  *
  * Both tiers run with broadcast JOINS DISABLED (auto threshold -1,
  * including the AQE runtime rewrite) — the honest simulation of the
  * regime where the benchmark string set exceeds broadcast budget:
  *   exact  every exploded corpus gram shuffles to meet the benchmark
  *   bloom  the word-vector prefilter (still a tiny 1-row broadcast —
  *          that is the tier's point) drops all but hits + fpp BEFORE
  *          the shuffle; only survivors shuffle into the confirm join
  * then checks the two outputs row-for-row and prints the gram
  * cardinalities, the filter's actual byte size vs the benchmark's
  * string bytes, and both wall times.
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val benchDocs = args.drop(1).headOption.map(_.toInt).getOrElse(50000)
    val copies = args.drop(2).headOption.map(_.toInt).getOrElse(1)
    val spark = Tables.session(32)
    import spark.implicits._
    // the regime under test: nothing broadcast-joins unless an operator
    // asks for it explicitly (the bloom's 1-row cross join still does)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val base = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val copyStride = base.agg(max("doc_id")).head.getLong(0) + 1L
    val corpus0 = (0 until copies).map(k =>
      base.select((col("doc_id") + k * copyStride).as("doc_id"), col("text")))
      .reduce(_ union _)
    val bench = spark.range(benchDocs.toLong).select(
      concat_ws(" ", transform(sequence(lit(0), lit(39)),
        i => concat(lit("bw"), col("id") * 40 + i))).as("t"))
      .localCheckpoint(true)
    // plant hits: every 7th-ish doc appends the first 5 tokens of its
    // benchmark doc -> exactly one shared 5-gram
    val corpus = corpus0
      .withColumn("t",
        when(col("doc_id") % 7 === 3,
          concat(col("text"), lit(" "),
            concat_ws(" ", transform(sequence(lit(0), lit(4)),
              i => concat(lit("bw"), pmod(col("doc_id"), lit(benchDocs.toLong)) * 40 + i)))))
          .otherwise(col("text")))
      .select(col("doc_id"), col("t"))
      .localCheckpoint(true)
    val nGrams = bench.select(explode(split(col("t"), " "))).count() // ~40/doc
    println(s"[bloom] corpus=${corpus.count()} benchDocs=$benchDocs " +
      s"benchTokens=$nGrams copies=$copies ($dir)")

    def time[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[bloom] $label%-34s $s%7.2f s")
      (r, s)
    }
    // warm both input paths once
    corpus.count(); bench.count()

    // the hinted tier force-broadcasts the gram STRINGS — above ~50 k
    // bench docs (~2 M grams, ~100 MB hash relation) that is the leg
    // that falls over on a 4 GB driver, which is the tier boundary the
    // probe exists to demonstrate; skip it there rather than crash
    val runBcast = benchDocs <= 50000
    val (exact, tExact) = if (runBcast) {
      time("exact tier (forced broadcast hint)") {
        TextAnalysis.contaminationHits(corpus, bench, "doc_id", "t")
          .localCheckpoint(true)
      }
    } else {
      println("[bloom] exact tier (forced broadcast hint)    SKIPPED " +
        "(benchmark past single-driver broadcast budget)")
      (null, Double.NaN)
    }
    // the exact tier WITHOUT its broadcast hint — what physically runs
    // once the benchmark exceeds broadcast budget: every exploded
    // corpus gram shuffles into a sort-merge join
    val gramArr =
      """array_distinct(IF(size(__toks) >= 5,
           transform(sequence(1, size(__toks) - 4),
             i -> concat_ws(' ', element_at(__toks, i), element_at(__toks, i + 1),
                  element_at(__toks, i + 2), element_at(__toks, i + 3),
                  element_at(__toks, i + 4))),
           CAST(array() AS ARRAY<STRING>)))"""
    val (exactShuf, tShuf) = time("exact w/o hint (gram shuffle join)") {
      val bg = bench.withColumn("__toks", split(col("t"), " "))
        .select(explode(expr(gramArr)).as("gram")).distinct()
      val dg = corpus.withColumn("__toks", split(col("t"), " "))
        .withColumn("__gs", expr(gramArr))
        .select(col("doc_id"), size(col("__gs")).as("n_grams"),
          explode(col("__gs")).as("gram"))
      dg.join(bg, Seq("gram"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("int").as("n_hits"),
          first(col("n_grams")).cast("int").as("n_grams"))
        .localCheckpoint(true)
    }
    val (blm, tBloom) = time("bloom tier (prefilter + confirm)") {
      TextAnalysis.contaminationHitsBloom(corpus, bench, "doc_id", "t")
        .localCheckpoint(true)
    }
    val onlyE = exactShuf.exceptAll(blm).count()
    val onlyB = blm.exceptAll(exactShuf).count()
    require(onlyE == 0 && onlyB == 0,
      s"bloom tier diverged from exact: onlyExact=$onlyE onlyBloom=$onlyB")
    if (runBcast)
      require(exactShuf.exceptAll(exact).count() == 0 &&
        exact.exceptAll(exactShuf).count() == 0,
        "shuffle variant diverged from the hinted exact tier")
    // structural sizes: what each tier ships to every task
    val distinctGrams = bench
      .withColumn("__toks", split(col("t"), " "))
      .select(explode(expr(
        """array_distinct(IF(size(__toks) >= 5,
             transform(sequence(1, size(__toks) - 4),
               i -> concat_ws(' ', element_at(__toks, i), element_at(__toks, i + 1),
                    element_at(__toks, i + 2), element_at(__toks, i + 3),
                    element_at(__toks, i + 4))),
             CAST(array() AS ARRAY<STRING>)))""")).as("gram")).distinct()
    val stats = distinctGrams.agg(count(lit(1)), sum(length(col("gram")))).head()
    val (g, strBytes) = (stats.getLong(0), stats.getLong(1))
    val k = math.max(1, math.round(-math.log(0.01) / math.log(2.0)).toInt)
    val words = (((math.ceil(g.toDouble * k / math.log(2.0)).toLong max 64L) + 63L) / 64L * 64L) / 64L
    println(f"[bloom] benchGrams=$g%d stringBytes=${strBytes / 1048576.0}%.1f MB " +
      f"bloomBytes=${words * 8 / 1048576.0}%.2f MB hits=${exactShuf.count()}%d " +
      f"exactBcast=${tExact}%.2f s exactShuffle=${tShuf}%.2f s bloom=${tBloom}%.2f s")
    println("[bloom] row-identical outputs; the prefilter shuffles only " +
      "survivors where the exact tier shuffles every exploded corpus gram")
    spark.stop()
  }
}
