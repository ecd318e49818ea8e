package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming smoke: the windowed agg must produce the same totals as its
  * batch twin over the same rows (streams driven synchronously from a
  * parquet drop of converted events).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = Tables.session(4)

  lazy val stagingDir = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts_ts").as("ts"), col("user_id"),
        col("event_type"), col("value"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming hourly agg matches batch over the same data") {
    val stream = EventStream.hourlyAgg(EventStream.readEvents(spark, stagingDir))
    EventStream.runToMemory(stream, "hourly", OutputMode.Append())
    val streamed = spark.table("hourly")
      .agg(sum("cnt")).head().getLong(0)
    // append-mode emits only watermark-closed windows; all windows close
    // because AvailableNow drains the source then advances the watermark
    val batch = spark.read.parquet(stagingDir).count()
    assert(streamed <= batch)
    assert(streamed > 0)
  }

  test("mapGroupsWithState user totals match batch groupBy") {
    import spark.implicits._
    val events = EventStream.readEvents(spark, stagingDir).as[EventStream.Event]
    val q = EventStream.userTotals(events).writeStream
      .outputMode(OutputMode.Update()).format("memory").queryName("usertotals")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("usertotals")
      .groupBy("user_id").agg(max("n_events").as("n"))
    val expected = spark.read.parquet(stagingDir).groupBy("user_id").count()
    val joined = got.join(expected, "user_id")
      .filter(col("n") =!= col("count")).count()
    assert(joined == 0, "streaming per-user counts diverge from batch")
  }

  test("stream-static enrichment joins every event to its dimension row") {
    val dim = spark.read.parquet(stagingDir)
      .select(col("user_id")).distinct()
      .withColumn("user_tier", (col("user_id") % 3).cast("int"))
    val enriched = EventStream.enrich(
      EventStream.readEvents(spark, stagingDir), dim, "user_id")
    EventStream.runToMemory(enriched, "enriched", OutputMode.Append())
    val got = spark.table("enriched")
    val total = spark.read.parquet(stagingDir).count()
    assert(got.count() == total)
    assert(got.filter(col("user_tier").isNull).count() == 0,
      "some events missed their dimension row")
  }

  test("watermarked streaming dedup drops exact re-deliveries") {
    // stage a doubled drop: every event delivered twice
    val dupDir = java.nio.file.Files.createTempDirectory("events_dup").toString
    val once = spark.read.parquet(stagingDir)
    once.union(once).write.mode("overwrite").parquet(dupDir)
    val dedup = EventStream.dedupStream(
      EventStream.readEvents(spark, dupDir), Seq("event_id"))
    EventStream.runToMemory(dedup, "dedup_stream", OutputMode.Append())
    val got = spark.table("dedup_stream").count()
    assert(got == once.count(),
      s"dedup stream kept $got of ${2 * once.count()} doubled rows; expected ${once.count()}")
  }

  test("streaming session_window agg emits exactly the watermark-closed batch sessions") {
    val gapUs = 1800000000L
    val wmUs = 600000000L // 10 minutes, matches sessionAgg's watermark
    val stream = EventStream.sessionAgg(EventStream.readEvents(spark, stagingDir))
    EventStream.runToMemory(stream, "sess_stream", OutputMode.Append())
    val streamed = spark.table("sess_stream")
      .select(col("user_id"), unix_micros(col("sess_start")).as("s"), col("n_events"))
    val evB = Tables(spark, "/root/testdata/sf0.001", "events")
      .withColumn("ts_us", expr("ts div 1000"))
    val batchSess = graft.operators.Sessionize.manualSessions(
        evB, "user_id", "ts_us", "event_id", gapUs)
      .groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("n_events"), min("ts_us").as("s"), max("ts_us").as("e"))
    // append mode emits a session once the watermark passes its window
    // end (= last event + gap); the final watermark under AvailableNow is
    // max event time − delay, so tail sessions legitimately stay open
    val wm = evB.agg(max("ts_us")).head().getLong(0) - wmUs
    val nStrict = batchSess.filter(col("e") + gapUs < wm).count()
    val nLenient = batchSess.filter(col("e") + gapUs <= wm).count()
    val n = streamed.count()
    assert(n == nStrict || n == nLenient,
      s"streamed $n sessions; batch closed-session count is $nStrict/$nLenient")
    // every emitted session matches a batch session exactly (start + size)
    val matched = streamed.join(batchSess, Seq("user_id", "s", "n_events"), "left_semi").count()
    assert(matched == n, s"only $matched of $n streamed sessions match batch sessionization")
  }

  test("streaming PII scrub matches batch q80 row-for-row") {
    // q80's augmented corpus (synthetic emails/IPs/phones appended),
    // staged as a parquet drop and scrubbed under readStream — counts
    // and scrubbed-text md5 must equal the batch gate exactly
    val aug = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), expr(
        "text || ' contact user' || CAST(doc_id AS STRING) || " +
          "'@example.com from +14155550' || CAST(doc_id % 100 AS STRING) || " +
          "' at 10.0.' || CAST(doc_id % 256 AS STRING) || '.7'").as("text"))
    val dir = java.nio.file.Files.createTempDirectory("docs_scrub").toString
    aug.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(dir)
    EventStream.runToMemory(EventStream.scrubDocs(stream), "scrubbed", OutputMode.Append())
    val streamed = spark.table("scrubbed")
    val batch = EventStream.scrubDocs(aug)
    assert(streamed.count() == aug.count())
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "streaming scrub diverges from the batch gate")
  }

  test("streaming token-window chunking matches batch q115 chunk-for-chunk") {
    // chunkTokens is one posexplode over pure integer-expression
    // arithmetic — stateless, so the SAME operator runs unchanged under
    // readStream (the shard-arrival shape that feeds per-chunk
    // embedding); the accumulated (doc, idx, size, text) set must equal
    // the batch run exactly
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("docs_chunk").toString
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(dir)
    EventStream.runToMemory(
      graft.operators.TextAnalysis.chunkTokens(stream, "doc_id", "text",
        window = 32, overlap = 8),
      "chunked", OutputMode.Append())
    val streamed = spark.table("chunked")
    val batch = graft.operators.TextAnalysis.chunkTokens(docs, "doc_id", "text",
      window = 32, overlap = 8)
    assert(streamed.count() == batch.count() && streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "streaming chunking diverges from the batch operator")
  }

  test("streaming line-dedup matches batch q81's explode+aggregate outputs") {
    // q81's 3-line documents (text twice + unique tail) through the
    // STATELESS array-expression twin under readStream, compared with
    // the batch explode + hash-aggregate path: both must agree on
    // n_lines / n_unique / first-occurrence-ordered md5 per document
    val aug = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), expr(
        "text || char(10) || text || char(10) || 'tail marker ' || " +
          "CAST(doc_id AS STRING)").as("text"))
    val dir = java.nio.file.Files.createTempDirectory("docs_linededup").toString
    aug.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(dir)
    EventStream.runToMemory(EventStream.dedupDocLines(stream), "linededup", OutputMode.Append())
    val streamed = spark.table("linededup")
      .select(col("doc_id"), col("n_lines").cast("int"),
        col("n_unique").cast("int"), col("dedup_md5"))
    val batch = graft.operators.TextAnalysis.dedupLines(aug, "doc_id", "text")
    assert(streamed.count() == aug.count())
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "stateless streaming line-dedup diverges from the batch aggregate")
  }

  test("streaming corpus curation survives the same fingerprint set as batch") {
    // stage documents + an exact-duplicate wave (re-crawl analog) with
    // ingest timestamps; the stream must keep exactly one survivor per
    // fingerprint and apply the same quality/language gates as batch q71
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val redelivered = docs.withColumn("doc_id", col("doc_id") + 1000000L)
    val staged = docs.union(redelivered)
      .withColumn("ingest_ts", timestamp_micros(lit(1700000000000000L) + col("doc_id")))
    val dir = java.nio.file.Files.createTempDirectory("docs_stream").toString
    staged.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, ingest_ts TIMESTAMP")
      .parquet(dir)
    EventStream.runToMemory(EventStream.curateDocs(stream), "curated", OutputMode.Append())
    val streamedFps = spark.table("curated").select("fp")
      .collect().map(_.getString(0)).sorted

    val batch = graft.operators.TextAnalysis.withLangId(
        staged
          .withColumn("fp", graft.operators.TextAnalysis.normalizedFingerprint("text"))
          .withColumn("n_tokens", size(split(col("text"), " ")))
          .withColumn("n_distinct", size(array_distinct(split(col("text"), " ")))),
        "text")
      .dropDuplicates("fp")
      .filter(col("n_tokens") >= 20 &&
        col("n_distinct").cast("double") / col("n_tokens") >= 0.3)
      .filter(col("lang_pred") === "en")
    val batchFps = batch.select("fp").collect().map(_.getString(0)).sorted

    assert(streamedFps.nonEmpty, "curation stream emitted nothing")
    assert(streamedFps.length == streamedFps.distinct.length,
      "stream emitted duplicate fingerprints")
    assert(streamedFps.sameElements(batchFps),
      s"survivor sets differ: stream=${streamedFps.length} batch=${batchFps.length}")
  }

  test("streaming repetition gate matches batch q84's explode+aggregate profile") {
    // q84's 3-line documents through the STATELESS sorted-run-fold twin
    // under readStream, compared with the batch explode + two hash
    // aggregates: every metric is an exact integer ratio, so the rows
    // must agree bit-for-bit
    val aug = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), expr(
        "concat(text, char(10), " +
          "CASE WHEN doc_id % 3 = 0 THEN text " +
          "ELSE concat('tail marker ', CAST(doc_id AS STRING)) END, " +
          "char(10), 'end ', CAST(doc_id % 7 AS STRING))").as("text"))
    val dir = java.nio.file.Files.createTempDirectory("docs_rep").toString
    aug.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(dir)
    EventStream.runToMemory(EventStream.repetitionGate(stream), "repgate", OutputMode.Append())
    val streamed = spark.table("repgate")
    val batch = graft.operators.TextAnalysis.repetitionProfile(aug, "doc_id", "text")
    assert(streamed.count() == aug.count())
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "stateless streaming repetition profile diverges from the batch aggregate")
  }

  test("streaming contamination gate matches batch q85's broadcast join") {
    // benchmark grams collected once (static, tiny) and shipped as a
    // literal array; the per-row intersect under readStream must flag
    // exactly the docs the batch join+aggregate flags
    val base = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val bench = base.filter(col("doc_id") % 50 === 0)
    val corpus = base.filter(col("doc_id") % 50 =!= 0)
    val grams = bench.withColumn("__toks", split(col("text"), " "))
      .select(explode(expr(
        """array_distinct(IF(size(__toks) >= 5,
             transform(sequence(1, size(__toks) - 4),
               i -> concat_ws(' ', element_at(__toks, i), element_at(__toks, i + 1),
                              element_at(__toks, i + 2), element_at(__toks, i + 3),
                              element_at(__toks, i + 4))),
             CAST(array() AS ARRAY<STRING>)))""")).as("g"))
      .distinct().collect().map(_.getString(0)).toSeq
    val dir = java.nio.file.Files.createTempDirectory("docs_contam").toString
    corpus.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(dir)
    EventStream.runToMemory(EventStream.contaminationGate(stream, grams), "contam", OutputMode.Append())
    val streamed = spark.table("contam")
    val batch = graft.operators.TextAnalysis.contaminationHits(
      corpus, bench, "doc_id", "text")
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "stateless streaming contamination gate diverges from the batch join")
  }

  test("streaming int8 quantization matches batch q88 verbatim") {
    // quantizeInt8 is a pure per-row projection (no shuffle, no state),
    // so the OPERATOR ITSELF runs under readStream — same code path as
    // batch, pinned row-for-row on codes, scale, and error
    val embs = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("embs_quant").toString
    embs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>").parquet(dir)
    EventStream.runToMemory(
      graft.operators.Similarity.quantizeInt8(stream, "vec_id", "embedding"),
      "quant", OutputMode.Append())
    val streamed = spark.table("quant")
    val batch = graft.operators.Similarity.quantizeInt8(embs, "vec_id", "embedding")
    assert(streamed.count() == embs.count())
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "streaming quantization diverges from batch")
  }

  test("streaming classifier inference matches batch q91 verbatim") {
    // hashedLinearScore is a pure projection — the gate scores documents
    // under readStream with the identical code path
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("docs_clf").toString
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(dir)
    EventStream.runToMemory(
      graft.operators.TextAnalysis.hashedLinearScore(stream, "doc_id", "text"),
      "clf", OutputMode.Append())
    val streamed = spark.table("clf")
    val batch = graft.operators.TextAnalysis.hashedLinearScore(docs, "doc_id", "text")
    assert(streamed.count() == docs.count())
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "streaming classifier inference diverges from batch")
  }

  test("streaming perplexity gate with a shipped LM matches batch q92") {
    import spark.implicits._
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    // fit the LM batch-side (the offline pass), ship it as a literal map
    val vocabRows = docs.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt")).collect()
    val vocab = vocabRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val nTotal = vocab.values.sum
    val nVocab = vocab.size.toLong
    val dir = java.nio.file.Files.createTempDirectory("docs_ppl").toString
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(dir)
    EventStream.runToMemory(
      EventStream.perplexityGate(stream, vocab, nTotal, nVocab),
      "ppl", OutputMode.Append())
    val streamed = spark.table("ppl")
      .select(col("doc_id"), col("n_tokens").as("s_ntok"), col("avg_nll").as("s_nll"))
    val batch = graft.operators.TextAnalysis.unigramNll(docs, "doc_id", "text")
    val joined = streamed.join(batch, "doc_id")
    assert(joined.count() == docs.count())
    // summation ORDER differs (join-row aggregate vs left-to-right HOF):
    // equal to 1e-9, not bit-equal
    val bad = joined.filter(
      col("s_ntok") =!= col("n_tokens") ||
        abs(col("s_nll") - col("avg_nll")) > 1e-9).count()
    assert(bad == 0, "shipped-LM streaming scores diverge from the batch fit")
  }

  test("streaming flatten gate with shipped thresholds matches batch q95") {
    import graft.operators.Sampling
    // fit the thresholds batch-side (tiny count aggregate), ship as map
    val grouped = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), substring(col("source"), 4, 1).as("src_group"))
    val counts = grouped.groupBy("src_group").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = counts.values.min
    val thresholds = counts.map { case (k, n) =>
      k -> math.floor(4294967296L * math.sqrt(nMin.toDouble / n)).toLong
    }
    val dir = java.nio.file.Files.createTempDirectory("docs_flatten").toString
    grouped.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, src_group STRING").parquet(dir)
    EventStream.runToMemory(
      EventStream.flattenGate(stream, "src_group", "doc_id", thresholds),
      "flattened", OutputMode.Append())
    val streamed = spark.table("flattened").select("doc_id", "src_group")
    val batch = Sampling.inverseSqrtFlatten(grouped, "src_group", "doc_id")
      .select("doc_id", "src_group")
    assert(batch.count() > 0 && batch.count() < grouped.count()) // gate engaged
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "streaming flatten gate diverges from the batch operator")
  }

  test("streaming bigram-perplexity gate with a shipped LM matches batch q98") {
    import spark.implicits._
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    // fit both count tables batch-side, ship as literal maps
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    val bigrams = toks.select(explode(expr(
        """transform(sequence(1, size(t) - 1),
             i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1)))""")).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val contexts = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dir = java.nio.file.Files.createTempDirectory("docs_bppl").toString
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(dir)
    EventStream.runToMemory(
      EventStream.bigramPerplexityGate(stream, bigrams, contexts, contexts.size.toLong),
      "bppl", OutputMode.Append())
    val streamed = spark.table("bppl")
      .select(col("doc_id"), col("n_bigrams").as("s_nb"), col("avg_nll").as("s_nll"))
    val batch = graft.operators.TextAnalysis.bigramNll(docs, "doc_id", "text")
    val joined = streamed.join(batch, "doc_id")
    assert(joined.count() == batch.count() && joined.count() > 0)
    // summation order differs (HOF fold vs join-row aggregate): 1e-9 tol
    val bad = joined.filter(
      col("s_nb") =!= col("n_bigrams") ||
        abs(col("s_nll") - col("avg_nll")) > 1e-9).count()
    assert(bad == 0, "shipped bigram-LM streaming scores diverge from the batch fit")
  }

  test("incremental streaming packer matches batch q87 across two micro-batches") {
    import spark.implicits._
    // stage two files processed as SEPARATE micro-batches (mod-time order,
    // maxFilesPerTrigger=1): ids < 250 arrive first, the rest second, so
    // the segment at the boundary continues its greedy fold FROM STATE
    val toks = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("tok"))
    val streamDir = java.nio.file.Files.createTempDirectory("docs_pack").toString
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("pack_part").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      java.nio.file.Files.copy(part,
        java.nio.file.Paths.get(streamDir, name))
    }
    stage(toks.filter(col("doc_id") < 250), "a.parquet")
    Thread.sleep(1100) // distinct mod-time second so batch order is a then b
    stage(toks.filter(col("doc_id") >= 250), "b.parquet")
    val stream = spark.readStream.schema("doc_id LONG, tok INT")
      .option("maxFilesPerTrigger", "1").parquet(streamDir)
      .as[EventStream.PackDoc]
    val q = EventStream.runToMemory(
      EventStream.packGate(stream, budget = 512, segSize = 64).toDF(),
      "packed", OutputMode.Append())
    // prove the state-continuation path ran: the two files must have been
    // processed as at least two separate micro-batches
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected >= 2 micro-batches (maxFilesPerTrigger=1 not honored?)")
    val streamed = spark.table("packed")
    val batch = graft.operators.Packing
      .packGreedy(toks, "doc_id", "tok", budget = 512, segSize = 64)
      .select("doc_id", "seg", "bin", "seq_id", "n_tokens")
    assert(streamed.count() == toks.count())
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "incremental streaming packing diverges from the batch fold")
  }

  test("streaming corpus-match dedup gate matches its batch run verbatim") {
    // the online ingestion filter: corpus MinHashIndex built batch-side
    // (static), arriving docs scored under readStream via the IDENTICAL
    // operator code path — per-row signatures, two stream-static
    // equi-joins, first-colliding-band dedup instead of a stateful
    // distinct, so the query plan holds no state at all
    import graft.operators.Dedup
    val base = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    // shard = id-shifted copies of every 7th doc: every shard doc has an
    // identical corpus twin, so matches are guaranteed non-empty
    val shard = base.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 10000000L)
    val cIdx = Dedup.minhashIndex(base, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("docs_dedupgate").toString
    shard.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(dir)
    EventStream.runToMemory(
      Dedup.minhashLshMatchCorpus(stream, "doc_id", "text", cIdx, threshold = 0.8),
      "dedupgate", OutputMode.Append())
    val streamed = spark.table("dedupgate")
    val batch = Dedup.minhashLshMatchCorpus(shard, "doc_id", "text", cIdx, threshold = 0.8)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "streaming corpus-match dedup gate diverges from its batch run")
  }

  test("streaming containment gate matches its batch run verbatim") {
    // the online decontamination question — "is this arriving doc an
    // excerpt of anything in the corpus?" — under readStream: per-row
    // shingling, two stream-static joins against the persisted
    // ContainmentIndex, first-shared-gram emission instead of a
    // stateful distinct, per-row array_intersect instead of a count
    // aggregate; no state anywhere
    import graft.operators.Dedup
    val base = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    // shard = first-half excerpts of every 3rd doc: every shard doc is
    // fully contained in its source, so matches are guaranteed
    val shard = base.filter(col("doc_id") % 3 === 0)
      .withColumn("__toks", split(col("text"), " "))
      .withColumn("text",
        expr("concat_ws(' ', slice(__toks, 1, CAST(size(__toks) DIV 2 AS INT)))"))
      .select((col("doc_id") + 20000000L).as("doc_id"), col("text"))
    val cIdx = Dedup.containmentIndex(base, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("docs_containgate").toString
    shard.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(dir)
    EventStream.runToMemory(
      Dedup.containmentMatchCorpus(stream, "doc_id", "text", cIdx, tau = 0.5),
      "containgate", OutputMode.Append())
    val streamed = spark.table("containgate")
    val batch = Dedup.containmentMatchCorpus(shard, "doc_id", "text", cIdx, tau = 0.5)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "streaming containment gate diverges from its batch run")
  }

  test("streaming embedding corpus-match gate matches its batch run verbatim") {
    // the vector twin of the dedup gate: corpus EmbedIndex built
    // batch-side (static), arriving embeddings scored under readStream
    // via the IDENTICAL operator code path — per-row band keys, one
    // stream-static (t, h) equi-join, first-colliding-table dedup
    // instead of a stateful distinct; no state anywhere
    import graft.operators.Similarity
    import spark.implicits._
    val base = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    // a zero-norm vector in the arriving shard must be dropped by the
    // gate (withNorm contract), not crash the ANSI 0/0 rescore or band
    // to the all-ones key and join real candidates
    val shard = base.filter(col("vec_id") % 5 === 0)
      .withColumn("vec_id", col("vec_id") + 10000000L)
      .union(Seq((30000001L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding"))
    val cIdx = Similarity.embedIndex(base, "vec_id", "embedding", dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("emb_dupgate").toString
    shard.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .parquet(dir)
    EventStream.runToMemory(
      Similarity.lshDupMatchCorpus(stream, "vec_id", "embedding", cIdx, threshold = 0.9),
      "embdupgate", OutputMode.Append())
    val streamed = spark.table("embdupgate")
    val batch = Similarity.lshDupMatchCorpus(shard, "vec_id", "embedding", cIdx,
      threshold = 0.9)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "streaming embedding corpus-match gate diverges from its batch run")
  }

  test("pair families build lazily under Staging.None (pair-mass probe skipped)") {
    // the conditional-collapse probe is an eager .head() at
    // plan-construction time; under Staging.None (the documented
    // streaming-safe pass-through) it must be skipped — previously mere
    // CONSTRUCTION of these ops over a streaming input threw
    import graft.operators.{Dedup, Similarity, Staging}
    val base = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).limit(50)
    val dir = java.nio.file.Files.createTempDirectory("docs_lazyprobe").toString
    base.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(dir)
    // collapsePairsPerDoc = 0 would force the collapse branch on any dup
    // mass — Staging.None must win and take the lean branch without
    // running a probe job
    val m = Dedup.minhashLshPairs(stream, "doc_id", "text",
      staging = Staging.None, collapsePairsPerDoc = 0.0)
    val s = Dedup.simhashPairs(stream, "doc_id", "text",
      staging = Staging.None, collapsePairsPerDoc = 0.0)
    val c = Dedup.containmentJoin(stream, "doc_id", "text", tau = 0.5,
      staging = Staging.None, collapsePairsPerDoc = 0.0)
    assert(m.isStreaming && s.isStreaming && c.isStreaming)
    val embBase = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding")).limit(50)
    val edir = java.nio.file.Files.createTempDirectory("emb_lazyprobe").toString
    embBase.write.mode("overwrite").parquet(edir)
    val estream = spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .parquet(edir)
    val e = Similarity.lshDupPairs(estream, "vec_id", "embedding", threshold = 0.9,
      dim = 64, staging = Staging.None, collapsePairsPerDoc = 0.0)
    assert(e.isStreaming)
    // batch side: Staging.None still takes the lean branch (probe
    // skipped), and the lean output is row-identical to the collapse
    // branch per the families' branch-identity contract
    val clones = base.union(base.withColumn("doc_id", col("doc_id") + 1000000L))
    val lean = Dedup.minhashLshPairs(clones, "doc_id", "text",
      staging = Staging.None, collapsePairsPerDoc = 0.0)
    val collapsed = Dedup.minhashLshPairs(clones, "doc_id", "text",
      collapsePairsPerDoc = 0.0)
    assert(lean.exceptAll(collapsed).count() == 0 &&
      collapsed.exceptAll(lean).count() == 0,
      "Staging.None lean branch diverges from the collapse branch")
  }

  test("streaming KDE-NB gate == batch scorer on the same rows (shipped-model pattern)") {
    import graft.operators.KdeNb
    val batchRows = spark.read.parquet(stagingDir)
      .select(col("event_id"), col("event_type"),
        col("user_id").cast("double").as("user_id"),
        col("value").cast("double").as("value"))
    val model = KdeNb.fit(batchRows, Seq("user_id", "value"), "event_type")
    val dir = java.nio.file.Files.createTempDirectory("kde_stream").toString
    batchRows.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema("event_id LONG, event_type STRING, user_id DOUBLE, value DOUBLE")
      .parquet(dir)
    val gated = EventStream.kdeNbGate(stream, model)
    assert(gated.isStreaming, "gate must stay streaming (pure projection)")
    EventStream.runToMemory(gated, "kde_gate", OutputMode.Append())
    val streamed = spark.table("kde_gate")
      .select("event_id", "pred", "posterior_0")
    val batch = KdeNb.score(batchRows, model)
      .select("event_id", "pred", "posterior_0")
    assert(streamed.count() == batchRows.count())
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "streaming KDE-NB posteriors diverge from batch")
  }

  test("packGateEvicting frees idle segment state; a late arrival re-opens a fresh fold") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    def drive(evicting: Boolean, sink: String): Map[Long, Int] = {
      val src = MemoryStream[EventStream.PackDocT]
      val gate =
        if (evicting)
          EventStream.packGateEvicting(src.toDS(), budget = 100, segSize = 64,
            ttlMs = 5000L)
        else
          EventStream.packGate(
            src.toDS().map(d => EventStream.PackDoc(d.doc_id, d.tok)),
            budget = 100, segSize = 64)
      val q = gate.toDF().writeStream.outputMode("append")
        .format("memory").queryName(sink).start()
      // batch 1: segment 0 fills bin 0 to 60/100
      src.addData(EventStream.PackDocT(0L, 60, ts(10)))
      q.processAllAvailable()
      // batch 2: far-future activity in another segment advances event time
      src.addData(EventStream.PackDocT(1000L, 10, ts(1000)))
      q.processAllAvailable()
      // batch 3: watermark (from batch 2's max) is now past segment 0's
      // deadline (10s + 5s TTL) — this batch fires the timeout
      src.addData(EventStream.PackDocT(1001L, 10, ts(1001)))
      q.processAllAvailable()
      // batch 4: a straggler for segment 0 (not watermark-late itself)
      src.addData(EventStream.PackDocT(1L, 60, ts(1002)))
      q.processAllAvailable()
      q.stop()
      spark.table(sink).collect()
        .map(r => r.getLong(0) -> r.getInt(2)).toMap // doc_id -> bin
    }
    val evicted = drive(evicting = true, "pack_evict")
    assert(evicted(0L) == 0)
    // state was freed: the straggler re-opens a FRESH fold (bin 0) even
    // though 60+60 > budget would have rolled a retained fold to bin 1
    assert(evicted(1L) == 0,
      s"segment state survived the TTL: straggler landed in bin ${evicted(1L)}")
    // control: the non-evicting gate retains state across the same
    // batches and rolls the straggler to bin 1
    val retained = drive(evicting = false, "pack_noevict")
    assert(retained(0L) == 0 && retained(1L) == 1,
      s"non-evicting control diverged: $retained")
  }

  test("userTotals frees idle user state; a late arrival re-opens from zero") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    def ev(id: Long, uid: Long, s: Long) =
      EventStream.Event(id, ts(s), uid, "click", 1.0)
    def drive(ttlMs: Long, sink: String): Map[Long, Long] = {
      val src = MemoryStream[EventStream.Event]
      val q = EventStream.userTotals(src.toDS(), ttlMs = ttlMs)
        .toDF().writeStream.outputMode("update")
        .format("memory").queryName(sink).start()
      // batch 1: user 7 accumulates two events
      src.addData(ev(1L, 7L, 10), ev(2L, 7L, 11))
      q.processAllAvailable()
      // batch 2: far-future activity from another user advances event time
      src.addData(ev(3L, 99L, 1000))
      q.processAllAvailable()
      // batch 3: watermark now past user 7's deadline — fires the timeout
      src.addData(ev(4L, 99L, 1001))
      q.processAllAvailable()
      // batch 4: straggler for user 7 (not watermark-late itself)
      src.addData(ev(5L, 7L, 1002))
      q.processAllAvailable()
      q.stop()
      // last emitted n_events per user (update mode re-emits per batch)
      spark.table(sink).groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("n_events").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // evicting run: user 7's state was freed at TTL, so the straggler
    // re-opens from zero — their max emitted total stays at the epoch-1
    // value 2 (the fresh epoch emits 1, not 3)
    val evicted = drive(ttlMs = 5000L, "ut_evict")
    assert(evicted(7L) == 2L,
      s"user state survived the TTL: straggler total ${evicted(7L)}")
    // control: with a TTL far beyond the stream's span, state is
    // retained and the straggler continues the lifetime fold to 3
    val retained = drive(ttlMs = 1000000000L, "ut_noevict")
    assert(retained(7L) == 3L, s"long-TTL control diverged: $retained")
    // TTL must be positive — the guard fires at plan time
    val src = MemoryStream[EventStream.Event]
    intercept[IllegalArgumentException] {
      EventStream.userTotals(src.toDS(), ttlMs = 0L)
    }
  }
}
