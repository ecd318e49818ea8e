package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured-Streaming surface over the events table shape (stretch
  * capability — the reference is batch-only, SURVEY §2.11). The same
  * windowed aggregation runs identically in batch (q22_time_window) and
  * here as a stream: readStream → watermark → window agg → sink, plus a
  * mapGroupsWithState session counter for custom state.
  *
  * At scale this is the standard shape: source partitions → stateful agg
  * partitioned by (window, key) in the state store, watermark bounds state
  * size; no collect anywhere.
  */
object EventStream {

  /** The events parquet schema once nanos→timestamp conversion is applied
    * upstream (streams read pre-converted parquet/json drops). */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(dir)

  /** Hourly per-type aggregation with a 10-minute watermark — the
    * streaming twin of q22_time_window. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)
  final case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

  /** Custom state: running per-user totals — with BOUNDED state lifetime
    * (round 9). The original NoTimeout version kept one UserAgg per
    * user_id forever: over an unbounded user space on a long-running
    * stream, that is the exact leak shape [[packGateEvicting]] closed
    * for segments, so the same TTL discipline applies here. Each batch a
    * user is seen, their timeout re-arms to (batch max event time +
    * ttlMs, clamped strictly above the watermark); once the watermark
    * passes that deadline with no new arrivals, the state is REMOVED —
    * total state is O(users active within one TTL window), regardless of
    * stream lifetime. The documented trade (identical to
    * packGateEvicting): a user idle past the TTL re-opens from ZERO, so
    * totals are per-activity-epoch, not per-lifetime — within the TTL
    * the running totals are identical to the unbounded fold (both pinned
    * in StreamingSpec). */
  def userTotals(events: Dataset[Event], ttlMs: Long = 86400000L,
                 watermarkDelay: String = "0 seconds"): Dataset[UserAgg] = {
    require(ttlMs > 0, s"userTotals needs a positive TTL, got $ttlMs ms — " +
      "a non-positive TTL would re-arm timeouts at or before the watermark, " +
      "which Spark rejects at runtime and kills the query")
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserAgg, UserAgg](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (uid, rows, state: GroupState[UserAgg]) =>
          if (state.hasTimedOut) {
            state.remove() // idle past TTL: user epoch closed, state freed
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0.0))
            val batch = rows.toSeq
            val next = UserAgg(uid, prev.n_events + batch.size,
              prev.total_value + batch.map(_.value).sum)
            state.update(next)
            state.setTimeoutTimestamp(math.max(batch.map(_.ts.getTime).max + ttlMs,
              state.getCurrentWatermarkMs + 1L))
            Iterator.single(next)
          }
      }
  }

  final case class PackDoc(doc_id: Long, tok: Int)
  final case class PackState(bin: Int, fill: Int)
  final case class PackOut(doc_id: Long, seg: Long, bin: Int, seq_id: Long,
                           n_tokens: Int)

  /** SPEC COMPARATOR ONLY (demoted round 10 — not public API): the
    * unbounded-state form of the incremental packing gate. One (bin,
    * fill) pair per segment, kept FOREVER (`NoTimeout`) — on a
    * long-running stream over an ever-growing segment space that is an
    * unbounded state leak, the exact shape [[userTotals]] and
    * [[packGateEvicting]] close with an event-time TTL. It survives
    * only as the exact-batch-parity reference StreamingSpec compares
    * the TTL gate against; production code uses [[packGateEvicting]],
    * the documented entry point. */
  private[graft] def packGate(docs: Dataset[PackDoc], budget: Int,
                              segSize: Int): Dataset[PackOut] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.doc_id / segSize)
      .flatMapGroupsWithState[PackState, PackOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (seg, rows, state: GroupState[PackState]) =>
          var st = state.getOption.getOrElse(PackState(0, 0))
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            st =
              if (st.fill > 0 && st.fill + d.tok > budget) PackState(st.bin + 1, d.tok)
              else PackState(st.bin, st.fill + d.tok)
            PackOut(d.doc_id, seg, st.bin, seg * segSize + st.bin, d.tok)
          }
          state.update(st)
          out.iterator
      }
  }

  final case class PackDocT(doc_id: Long, tok: Int, ts: java.sql.Timestamp)

  /** INCREMENTAL sequence packing — the stateful streaming twin of
    * `Packing.packGreedy`, and the ONE public entry point (round 10:
    * the unbounded [[packGate]] is demoted to a private spec
    * comparator). Each segment keeps O(1) state (the open sequence's
    * bin index and fill level); every micro-batch continues the greedy
    * first-fit fold over its arrivals in id order and emits their
    * assignments immediately — with BOUNDED state lifetime: an
    * unbounded segment space (a long-running stream over an
    * ever-growing id range) would otherwise leak state without limit.
    * The fold is keyed to an event-time clock: each batch a
    * segment is touched, its timeout is re-armed to (batch max event
    * time + ttlMs); once the watermark passes that deadline with no new
    * arrivals, the state is REMOVED. Total state is then O(segments
    * active within one TTL window) — the same bound watermarked aggs
    * enjoy — regardless of stream lifetime.
    *
    * The documented trade: a doc arriving for an already-evicted segment
    * re-opens it with a FRESH fold (bin 0, fill 0), so its bin/seq
    * assignments restart instead of continuing the evicted sequence —
    * eviction deliberately gives up exact batch parity for stragglers
    * older than the TTL, exactly as a watermark drops late rows. Within
    * the TTL (the ingest contract: segment ids arrive roughly in order,
    * a segment's docs within one window) assignments are identical to
    * [[packGate]]/`Packing.packGreedy` — both pinned in StreamingSpec. */
  def packGateEvicting(docs: Dataset[PackDocT], budget: Int, segSize: Int,
                       ttlMs: Long, watermarkDelay: String = "0 seconds"): Dataset[PackOut] = {
    require(ttlMs > 0, s"packGateEvicting needs a positive TTL, got $ttlMs ms — " +
      "a non-positive TTL would re-arm timeouts at or before the watermark, " +
      "which Spark rejects at runtime and kills the query")
    import docs.sparkSession.implicits._
    docs.withWatermark("ts", watermarkDelay)
      .groupByKey(_.doc_id / segSize)
      .flatMapGroupsWithState[PackState, PackOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (seg, rows, state: GroupState[PackState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle past TTL: segment closed, state freed
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(PackState(0, 0))
            val batch = rows.toSeq
            val out = batch.sortBy(_.doc_id).map { d =>
              st =
                if (st.fill > 0 && st.fill + d.tok > budget) PackState(st.bin + 1, d.tok)
                else PackState(st.bin, st.fill + d.tok)
              PackOut(d.doc_id, seg, st.bin, seg * segSize + st.bin, d.tok)
            }
            state.update(st)
            // clamp: a straggler that slipped the late filter could put
            // (max ts + ttl) at or below the current watermark, which
            // setTimeoutTimestamp rejects fatally — re-arm strictly above
            state.setTimeoutTimestamp(math.max(batch.map(_.ts.getTime).max + ttlMs,
              state.getCurrentWatermarkMs + 1L))
            out.iterator
          }
      }
  }

  /** Stateless streaming twin of the q92 perplexity gate: the unigram LM
    * is fit OFFLINE (batch `TextAnalysis.unigramNll` pass 1) and shipped
    * to the stream as a literal token→count map — the readStream analog
    * of a broadcast model. Scoring is then a pure per-row expression
    * (one map lookup per token inside a HOF), so it runs in append mode
    * with zero state. Trained-on-corpus semantics mean every token is in
    * the map when scoring the same corpus; unseen tokens (scoring NEW
    * data with an old LM) take the +1/(N+V) smoothing mass via the
    * coalesce. */
  def perplexityGate(docs: DataFrame, vocab: Map[String, Long],
                     nTotal: Long, nVocab: Long): DataFrame = {
    val denom = (nTotal + nVocab).toDouble
    docs.withColumn("__toks", split(col("text"), " "))
      .withColumn("__m", typedlit(vocab))
      .select(col("doc_id"),
        size(col("__toks")).cast("int").as("n_tokens"),
        expr(
          s"""aggregate(
                transform(__toks,
                  t -> -(ln((coalesce(element_at(__m, t), 0L) + 1) / ${denom}D) / ln(2.0D))),
                0D, (a, x) -> a + x)""")
          .divide(size(col("__toks"))).as("avg_nll"))
  }

  /** Streaming ingest dedup — the training-pipeline front door: duplicate
    * records (re-delivered events, re-crawled documents) are dropped by
    * key while the watermark bounds the dedup state, so state size is
    * O(keys per watermark window), not O(all history). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming sessionization — the streaming twin of the batch
    * q47/Sessionize path, via native session_window with gap-close
    * semantics bounded by the watermark. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("user_id"), col("sw.start").as("sess_start"),
        col("sw.end").as("sess_end"), col("n_events"), col("sum_value"))

  /** Streaming corpus curation — the batch q71 flow as a stream, which
    * is how a 100-TB training-data front door actually runs: normalized-
    * fingerprint dedup is the only STATEFUL stage (state bounded by the
    * ingest watermark), and the quality/language gates are the exact
    * same stateless expressions as batch (withLangId's staged scores
    * included). Selection within a duplicate group is arrival-order
    * (batch q71 pins min doc_id instead), so cross-checks compare the
    * surviving fingerprint SET, which is identical.
    * `docs` must carry an `ingest_ts` timestamp column. */
  def curateDocs(docs: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    import graft.operators.TextAnalysis
    val base = TextAnalysis.withLangId(
      docs
        .withColumn("fp", TextAnalysis.normalizedFingerprint("text"))
        .withColumn("n_tokens", size(TextAnalysis.tokens(col("text"))))
        .withColumn("n_distinct", size(array_distinct(TextAnalysis.tokens(col("text"))))),
      "text")
    base.withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("fp"))
      .filter(col("n_tokens") >= 20 &&
        col("n_distinct").cast("double") / col("n_tokens") >= 0.3)
      .filter(col("lang_pred") === "en")
      .select(col("doc_id"), col("fp"), col("n_tokens"))
  }

  /** Streaming PII scrub — q80's gate VERBATIM under readStream: pure
    * regexp projections (per-pattern counts over the original text +
    * sequential redaction), stateless, no watermark, fully codegen'd.
    * The canonical shape of a scrub pass at the training-data front
    * door: whatever throughput the source sustains, this keeps up. */
  def scrubDocs(docs: DataFrame): DataFrame = {
    import graft.operators.TextAnalysis
    val counts = TextAnalysis.piiCounts(col("text"))
    docs.select(col("doc_id") +: (counts.map { case (n, c) => c.as(n) } :+
      md5(TextAnalysis.scrubPii(col("text"))).as("scrub_md5")): _*)
  }

  /** Streaming boilerplate line-dedup — q81's semantics under
    * readStream via [[graft.operators.TextAnalysis.dedupLinesStateless]]
    * (per-document array expressions instead of the batch explode +
    * aggregate, which would need stateful aggregation in a stream). */
  def dedupDocLines(docs: DataFrame): DataFrame =
    graft.operators.TextAnalysis.dedupLinesStateless(docs, "doc_id", "text")

  /** Streaming repetition gate — q84's Gopher repetitiousness battery
    * under readStream via
    * [[graft.operators.TextAnalysis.repetitionProfileStateless]]
    * (sorted-run array folds instead of the batch explode + two hash
    * aggregates, which would be stateful in a stream). */
  def repetitionGate(docs: DataFrame): DataFrame =
    graft.operators.TextAnalysis.repetitionProfileStateless(docs, "doc_id", "text")

  /** Streaming decontamination gate — q85's benchmark n-gram screen
    * with the (tiny, static) benchmark gram set as a literal array:
    * per-document `array_intersect`, stateless, no join state. */
  def contaminationGate(docs: DataFrame, benchGrams: Seq[String]): DataFrame =
    graft.operators.TextAnalysis.contaminationHitsStateless(
      docs, "doc_id", "text", benchGrams)

  /** Streaming bigram-perplexity gate — q98 under readStream with the
    * SHIPPED-LM pattern of [[perplexityGate]]: bigram and context
    * counts fit offline, shipped as literal maps; scoring is a pure
    * per-row HOF chain (bigram extraction is per-document, stateless).
    * Unseen bigrams take the +1 smoothing mass over their context;
    * unseen contexts fall back to count 0 (the same formula the batch
    * fit produces for them). Docs under two tokens emit nothing,
    * matching the batch operator's inner-join contract. */
  def bigramPerplexityGate(docs: DataFrame, bigrams: Map[String, Long],
                           contexts: Map[String, Long], nVocab: Long): DataFrame =
    docs.withColumn("__toks", split(col("text"), " "))
      .withColumn("__m", size(col("__toks")))
      .filter(col("__m") >= 2)
      .withColumn("__bm", typedlit(bigrams))
      .withColumn("__cm", typedlit(contexts))
      .select(col("doc_id"),
        (col("__m") - 1).cast("int").as("n_bigrams"),
        expr(
          s"""aggregate(
                transform(sequence(1, __m - 1),
                  i -> -(ln((coalesce(element_at(__bm,
                          concat_ws(' ', element_at(__toks, i), element_at(__toks, i + 1))), 0L) + 1)
                        / CAST(coalesce(element_at(__cm, element_at(__toks, i)), 0L) + ${nVocab}L AS DOUBLE))
                     / ln(2.0D))),
                0D, (a, x) -> a + x)""")
          .divide(col("__m") - 1).as("avg_nll"))

  /** Streaming source-flattening gate — q95's inverse-sqrt mixture
    * resample under readStream: the per-key thresholds are fit OFFLINE
    * (the tiny count aggregate of
    * [[graft.operators.Sampling.inverseSqrtFlatten]]) and ship as a
    * literal map, the broadcast-model analog of [[perplexityGate]]; the
    * gate itself is a stateless codegen hash-threshold comparison per
    * row. Keys absent from the map are dropped — the same inner-join
    * semantics as the batch operator. */
  def flattenGate(docs: DataFrame, keyCol: String, idCol: String,
                  thresholds: Map[String, Long]): DataFrame =
    docs.withColumn("__thr", element_at(typedlit(thresholds), col(keyCol)))
      .filter(col("__thr").isNotNull &&
        graft.operators.Sampling.selectionHash(col(idCol)) < col("__thr"))
      .drop("__thr")

  /** Streaming KDE-naive-Bayes gate — q106's scorer under readStream
    * with the shipped-model pattern of [[perplexityGate]]: the model is
    * fit OFFLINE by `KdeNb.fit` (grouped stats + binning — batch-only
    * work), and its density grids ride into the stream as literal
    * arrays inside the scoring projection, which is a pure stateless
    * per-row expression — the same classify-at-the-front-door shape as
    * the perplexity and langid gates. */
  def kdeNbGate(rows: DataFrame, model: graft.operators.KdeNb.Model): DataFrame =
    graft.operators.KdeNb.score(rows, model)

  /** Stream-static enrichment — the canonical streaming dimension
    * lookup: every micro-batch joins the static frame (broadcast — at
    * scale the dim is the small side by construction); stateless, no
    * watermark involved. */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Drive a streaming frame synchronously to a named in-memory sink
    * (local smoke-test harness; production would use kafka/parquet). */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): StreamingQuery = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }
}
