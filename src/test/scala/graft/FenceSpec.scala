package graft

import java.util.concurrent.CountDownLatch

import graft.operators.{Dedup, Fence, FenceHeldException, FenceLocker, Tombstones}
import graft.streaming.IngestLoop
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A fake conditional-put store for the locker seam: an in-memory map
  * with an atomic putIfAbsent standing in for S3-style
  * `If-None-Match` conditional writes. Loaded reflectively via
  * `spark.graft.fence.locker.<scheme>` — the path's scheme never
  * resolves to a real FileSystem, proving every fence operation routes
  * through the seam. */
class CondPutLocker extends FenceLocker {
  import CondPutLocker.store
  override def createExclusive(spark: SparkSession, p: Path, tag: String): Unit =
    if (store.putIfAbsent(p.toString, (tag, System.currentTimeMillis())) != null)
      throw new java.nio.file.FileAlreadyExistsException(p.toString)
  override def readTag(spark: SparkSession, p: Path): Option[String] =
    Option(store.get(p.toString)).map(_._1)
  override def ageMillis(spark: SparkSession, p: Path): Option[Long] =
    Option(store.get(p.toString))
      .map(e => math.max(0L, System.currentTimeMillis() - e._2))
  override def touch(spark: SparkSession, p: Path): Unit =
    store.computeIfPresent(p.toString, (_, e) => (e._1, System.currentTimeMillis()))
  override def delete(spark: SparkSession, p: Path): Boolean =
    store.remove(p.toString) != null
}
object CondPutLocker {
  val store = new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()
}

/** A locker that delegates to the builtin Hadoop locker but runs an
  * injectable hook INSIDE touch — the seam that lets a spec place a
  * forceRelease + stale-tag clobber exactly in the heartbeat's
  * verify-then-stamp window (the round-14 advisory's race), where the
  * tag bytes alone cannot expose it and only the fence-epoch bracket
  * can. */
class EpochRaceLocker extends FenceLocker {
  override def createExclusive(spark: SparkSession, p: Path, tag: String): Unit =
    Fence.HadoopLocker.createExclusive(spark, p, tag)
  override def readTag(spark: SparkSession, p: Path): Option[String] =
    Fence.HadoopLocker.readTag(spark, p)
  override def ageMillis(spark: SparkSession, p: Path): Option[Long] =
    Fence.HadoopLocker.ageMillis(spark, p)
  override def touch(spark: SparkSession, p: Path): Unit = {
    EpochRaceLocker.midTouch(p)
    Fence.HadoopLocker.touch(spark, p)
  }
  override def delete(spark: SparkSession, p: Path): Boolean =
    Fence.HadoopLocker.delete(spark, p)
}
object EpochRaceLocker {
  @volatile var midTouch: Path => Unit = _ => ()
}

/** A locker whose create fails with a NON-held invariant violation —
  * exercises acquireWait's retry discrimination: only the held-refusal
  * is retryable by waiting. */
class BrokenLocker extends FenceLocker {
  override def createExclusive(spark: SparkSession, p: Path, tag: String): Unit =
    throw new IllegalStateException("locker invariant violated: boom")
  override def readTag(spark: SparkSession, p: Path): Option[String] = None
  override def ageMillis(spark: SparkSession, p: Path): Option[Long] = None
  override def touch(spark: SparkSession, p: Path): Unit = ()
  override def delete(spark: SparkSession, p: Path): Boolean = false
}

/** Writer fencing between the streaming ingest loops and tombstone
  * compaction (round 11): both mutate the same persisted family tables —
  * ingest by appending an `ingest_batch` partition, compaction by a
  * drop+recreate rewrite from a snapshot — so an overlap could lose the
  * concurrent batch's append. The fence serializes them: the loser of
  * the race refuses LOUDLY and (for a micro-batch) replays after the
  * release. These tests prove the contract both by injected ordering
  * (acquire first, then attempt the other writer) and by a live
  * two-thread race: in every interleaving the family ends complete —
  * never a lost append, never a resurrected tombstone. */
class FenceSpec extends AnyFunSuite {
  lazy val spark = Tables.session(4)
  val dir = "/root/testdata/sf0.001"

  private def drop(names: String*): Unit =
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))

  private def cleanFamily(prefix: String): Unit = {
    drop(s"${prefix}_bands", s"${prefix}_shingles", s"${prefix}_meta",
      s"${prefix}_tombstones", s"${prefix}_bands__compact",
      s"${prefix}_shingles__compact", s"${prefix}_commits")
    Fence.forceRelease(spark, prefix)
  }

  private def docs = Tables(spark, dir, "documents")
    .select(col("doc_id"), col("text"))

  private def ingest(prefix: String, pairsDir: String,
                     batch: org.apache.spark.sql.DataFrame, bid: Long): Unit =
    IngestLoop.ingestMinhashBatch(batch, bid, "doc_id", "text", prefix,
      pairsDir, threshold = 0.5, numPerms = 32, rowsPerBand = 4, buckets = 8)

  test("acquire is exclusive; release verifies the owner; forceRelease recovers a crashed holder") {
    val p = "fence_basic"
    Fence.forceRelease(spark, p)
    Fence.acquire(spark, p, "writerA")
    assert(Fence.holder(spark, p).exists(_.startsWith("writerA @ ")))
    val e = intercept[IllegalStateException](Fence.acquire(spark, p, "writerB"))
    assert(e.getMessage.contains("writerA") && e.getMessage.contains("forceRelease"))
    // wrong owner cannot release someone else's fence
    intercept[IllegalArgumentException](Fence.release(spark, p, "writerB"))
    assert(Fence.holder(spark, p).nonEmpty)
    // crashed-holder recovery
    assert(Fence.forceRelease(spark, p))
    assert(Fence.holder(spark, p).isEmpty)
    // and the released fence is takeable again
    Fence.withFence(spark, p, "writerB") {
      assert(Fence.holder(spark, p).exists(_.startsWith("writerB @ ")))
    }
    assert(Fence.holder(spark, p).isEmpty)
  }

  test("N-way acquire race: exactly one winner per round, every round") {
    val p = "fence_nway"
    Fence.forceRelease(spark, p)
    (1 to 5).foreach { round =>
      val n = 8
      val start = new CountDownLatch(1)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val losses = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (1 to n).map { i =>
        new Thread(() => {
          start.await()
          try { Fence.acquire(spark, p, s"w$i"); wins.incrementAndGet() }
          catch { case _: IllegalStateException => losses.incrementAndGet() }
        })
      }
      threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
      assert(wins.get() == 1 && losses.get() == n - 1,
        s"round $round: ${wins.get()} winners / ${losses.get()} losers — " +
          "the create-exclusive acquire must admit exactly one writer")
      assert(Fence.forceRelease(spark, p))
    }
  }

  test("batch saves are fenced too: a save cannot overwrite a family another writer holds") {
    val p = "fence_sv"
    cleanFamily(p)
    try {
      Fence.acquire(spark, p, "ingestMinhashBatch bid=7")
      val e = intercept[IllegalStateException] {
        graft.operators.Dedup.saveMinhashIndex(
          graft.operators.Dedup.minhashIndex(docs.limit(50), "doc_id", "text"), p,
          buckets = 8)
      }
      assert(e.getMessage.contains("ingestMinhashBatch bid=7"))
      assert(!spark.catalog.tableExists(s"${p}_bands"),
        "a refused save must not have begun overwriting")
      Fence.release(spark, p, "ingestMinhashBatch bid=7")
      graft.operators.Dedup.saveMinhashIndex(
        graft.operators.Dedup.minhashIndex(docs.limit(50), "doc_id", "text"), p,
        buckets = 8)
      assert(spark.catalog.tableExists(s"${p}_bands"))
      assert(Fence.holder(spark, p).isEmpty)
    } finally cleanFamily(p)
  }

  test("injected ordering: an ingest micro-batch arriving mid-compaction refuses loudly, then replays losing nothing") {
    val p = "fence_mh1"
    cleanFamily(p)
    val pairsDir = java.nio.file.Files.createTempDirectory("fence_pairs1").toString
    try {
      ingest(p, pairsDir, docs.filter(col("doc_id") % 2 === 0), 0L)
      val base = spark.table(s"${p}_shingles").count()
      // the injected point: compaction holds the fence (as compactMinhash
      // does for its whole rewrite window)
      Fence.acquire(spark, p, "compactMinhash")
      val shard = docs.filter(col("doc_id") % 2 === 1)
      val e = intercept[IllegalStateException](ingest(p, pairsDir, shard, 1L))
      assert(e.getMessage.contains("compactMinhash"),
        s"refusal must name the holder: ${e.getMessage}")
      // nothing half-committed by the refused batch
      assert(spark.table(s"${p}_shingles").count() == base)
      Fence.release(spark, p, "compactMinhash")
      // the checkpoint replay after the release: exact, nothing lost
      ingest(p, pairsDir, shard, 1L)
      assert(spark.table(s"${p}_shingles").count() == base + shard.count())
      assert(spark.table(s"${p}_shingles")
        .filter(col("ingest_batch") === 1).count() == shard.count())
    } finally cleanFamily(p)
  }

  test("injected ordering: compaction arriving during a live batch commit refuses loudly") {
    val p = "fence_mh2"
    cleanFamily(p)
    val pairsDir = java.nio.file.Files.createTempDirectory("fence_pairs2").toString
    try {
      ingest(p, pairsDir, docs.filter(col("doc_id") % 2 === 0), 0L)
      Tombstones.add(docs.filter(col("doc_id") % 8 === 0).select("doc_id"),
        "doc_id", p)
      // the injected point: a micro-batch holds the fence mid-commit
      Fence.acquire(spark, p, "ingestMinhashBatch bid=1")
      val e = intercept[IllegalStateException](Tombstones.compactMinhash(spark, p))
      assert(e.getMessage.contains("ingestMinhashBatch bid=1"))
      // the family is untouched: no drop+recreate began
      assert(spark.catalog.tableExists(s"${p}_tombstones"))
      assert(!spark.catalog.tableExists(s"${p}_bands__compact"))
      Fence.release(spark, p, "ingestMinhashBatch bid=1")
      Tombstones.compactMinhash(spark, p)
      assert(!spark.catalog.tableExists(s"${p}_tombstones"))
    } finally cleanFamily(p)
  }

  test("two-thread race: compact vs concurrent batch commit — serialized or refused, never a lost append") {
    val p = "fence_race"
    cleanFamily(p)
    val pairsDir = java.nio.file.Files.createTempDirectory("fence_pairs3").toString
    try {
      val batch0 = docs.filter(col("doc_id") % 2 === 0)
      val shard = docs.filter(col("doc_id") % 2 === 1) // disjoint from the dead set
      ingest(p, pairsDir, batch0, 0L)
      val deadDf = docs.filter(col("doc_id") % 8 === 0).select("doc_id")
      val nDead = deadDf.count()
      Tombstones.add(deadDf, "doc_id", p)
      val start = new CountDownLatch(1)
      @volatile var compactRefused: Boolean = false
      @volatile var ingestRefused: Boolean = false
      @volatile var unexpected: Option[Throwable] = None
      def guard(body: => Unit, onFence: => Unit): Runnable = () => {
        start.await()
        try body catch {
          case e: IllegalStateException if e.getMessage.contains("writer fence") => onFence
          case t: Throwable => unexpected = Some(t)
        }
      }
      val a = new Thread(guard(Tombstones.compactMinhash(spark, p), { compactRefused = true }))
      val b = new Thread(guard(ingest(p, pairsDir, shard, 1L), { ingestRefused = true }))
      a.start(); b.start(); start.countDown(); a.join(); b.join()
      assert(unexpected.isEmpty, s"non-fence failure in race: ${unexpected.map(_.toString)}")
      assert(!(compactRefused && ingestRefused),
        "fence must admit at least one writer")
      // replay/retry the loser — the operational recovery both paths document
      if (ingestRefused) ingest(p, pairsDir, shard, 1L)
      if (compactRefused) Tombstones.compactMinhash(spark, p)
      // if compaction won the race (ran before the batch-1 append), the
      // tombstones folded physically; if it lost, they remain logical
      // until the next pass — either way NOTHING is lost: batch 1's
      // append is present in full and dead ids are invisible to loads
      val live = graft.operators.Tombstones.filter(
        spark.table(s"${p}_shingles"), "doc_id", p)
      assert(live.filter(col("ingest_batch") === 1).count() == shard.count(),
        "the concurrent batch's append must survive every interleaving")
      assert(live.count() == batch0.count() - nDead + shard.count())
      assert(Fence.holder(spark, p).isEmpty, "all fences released")
    } finally cleanFamily(p)
  }

  test("non-atomic fence scheme refuses loudly; spark.graft.fence.dir routes the fence to an atomic location") {
    val p = "fence_s3"
    // an object-store scheme has no atomic create-exclusive: the fence
    // must refuse BY NAME, before any filesystem call, naming both
    // remedies — not silently degrade to check-then-create
    spark.conf.set("spark.graft.fence.dir", "s3a://warehouse-bucket/locks")
    try {
      val e = intercept[IllegalStateException](Fence.acquire(spark, p, "writerA"))
      assert(e.getMessage.contains("s3a") &&
        e.getMessage.contains("spark.graft.fence.dir") &&
        e.getMessage.contains("spark.graft.fence.atomicSchemes"),
        s"scheme refusal must name the scheme and both remedies: ${e.getMessage}")
    } finally spark.conf.unset("spark.graft.fence.dir")
    // the standard deployment shape: data on the object store, fence on
    // an atomic location — every fence op routes to the configured dir
    val lockDir = java.nio.file.Files.createTempDirectory("fence_locks").toString
    spark.conf.set("spark.graft.fence.dir", lockDir)
    try {
      Fence.withFence(spark, p, "writerA") {
        assert(java.nio.file.Files.exists(
          java.nio.file.Paths.get(lockDir, s"${p}__fence")),
          "the fence file must land in the configured lock dir")
        assert(Fence.holder(spark, p).exists(_.startsWith("writerA @ ")))
      }
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(lockDir, s"${p}__fence")))
    } finally spark.conf.unset("spark.graft.fence.dir")
    // a deployment that KNOWS its store has real conditional-put create
    // can declare the scheme atomic — the gate opens (and the failure
    // here is only the missing connector, not the fence's refusal)
    spark.conf.set("spark.graft.fence.dir", "s3a://warehouse-bucket/locks")
    spark.conf.set("spark.graft.fence.atomicSchemes", "s3a")
    try {
      val e = intercept[Exception](Fence.acquire(spark, p, "writerA"))
      assert(!Option(e.getMessage).getOrElse("").contains("no atomic create-exclusive"),
        s"a declared-atomic scheme must pass the gate: ${e.getMessage}")
    } finally {
      spark.conf.unset("spark.graft.fence.dir")
      spark.conf.unset("spark.graft.fence.atomicSchemes")
    }
  }

  test("staleness: the fence records pid/host, heartbeat refreshes the liveness clock without breaking exclusivity") {
    val p = "fence_hb"
    Fence.forceRelease(spark, p)
    Fence.acquire(spark, p, "compactLike")
    try {
      val tag = Fence.holder(spark, p).get
      assert(tag.contains(" pid=") && tag.contains(" host="),
        s"the tag must carry staleness metadata: $tag")
      Thread.sleep(1200)
      val before = Fence.holderAgeMillis(spark, p).get
      assert(before >= 1000, s"age must accumulate while the holder is silent: $before ms")
      Fence.heartbeat(spark, p, "compactLike")
      val after = Fence.holderAgeMillis(spark, p).get
      assert(after < before,
        s"heartbeat must refresh the staleness clock: $after ms vs $before ms")
      // a heart-beaten fence is still exclusive, and the refusal carries
      // the staleness readout the operator needs before forceRelease
      val e = intercept[IllegalStateException](Fence.acquire(spark, p, "writerB"))
      assert(e.getMessage.contains("last heartbeat"),
        s"the refusal must report staleness: ${e.getMessage}")
      // a non-holder cannot stamp liveness on someone else's fence
      intercept[IllegalStateException](Fence.heartbeat(spark, p, "writerB"))
      assert(Fence.holder(spark, p).exists(_.startsWith("compactLike @ ")))
    } finally Fence.forceRelease(spark, p)
  }

  test("bounded fence wait: a streaming writer absorbs a compaction window instead of dying; past the deadline it refuses loudly") {
    val p = "fence_wait"
    Fence.forceRelease(spark, p)
    // a compaction-like holder that releases after ~1.5 s
    Fence.acquire(spark, p, "compactMinhash")
    val releaser = new Thread(() => {
      Thread.sleep(1500)
      Fence.release(spark, p, "compactMinhash")
    })
    releaser.start()
    try {
      // with the wait configured, the arriving writer WAITS through the
      // release and proceeds — no refusal, no dead streaming query
      val t0 = System.nanoTime()
      Fence.acquireWait(spark, p, "ingestLike", waitMs = 10000)
      val waited = (System.nanoTime() - t0) / 1e6
      assert(waited >= 1000, s"must have actually waited: $waited ms")
      assert(Fence.holder(spark, p).exists(_.startsWith("ingestLike @ ")))
      Fence.release(spark, p, "ingestLike")
      // past the deadline: the held-refusal surfaces exactly as acquire's
      Fence.acquire(spark, p, "compactMinhash")
      val e = intercept[IllegalStateException](
        Fence.acquireWait(spark, p, "ingestLike", waitMs = 300))
      assert(e.getMessage.contains("compactMinhash"))
      Fence.release(spark, p, "compactMinhash")
      // withFence picks the wait up from conf — an ingest batch under a
      // short-held fence completes instead of refusing
      spark.conf.set("spark.graft.fence.waitMs", "10000")
      try {
        Fence.acquire(spark, p, "compactMinhash")
        val r2 = new Thread(() => {
          Thread.sleep(800)
          Fence.release(spark, p, "compactMinhash")
        })
        r2.start()
        val got = Fence.withFence(spark, p, "ingestLike") { 42 }
        assert(got == 42)
        r2.join()
      } finally spark.conf.unset("spark.graft.fence.waitMs")
      // a non-atomic scheme is NOT retried — waiting cannot make
      // check-then-create atomic; the refusal is immediate
      spark.conf.set("spark.graft.fence.dir", "s3a://bucket/locks")
      try {
        val t1 = System.nanoTime()
        val e2 = intercept[IllegalStateException](
          Fence.acquireWait(spark, p, "ingestLike", waitMs = 10000))
        assert(e2.getMessage.contains("no atomic create-exclusive"))
        assert((System.nanoTime() - t1) / 1e6 < 5000,
          "scheme refusal must not burn the wait budget")
      } finally spark.conf.unset("spark.graft.fence.dir")
    } finally {
      releaser.join()
      Fence.forceRelease(spark, p)
    }
  }

  test("pluggable locker seam: a conditional-put locker declared for a scheme carries the fence and keeps exclusivity") {
    val p = "fence_locker"
    // route the fence to a scheme with no FileSystem connector at all —
    // only the declared locker can carry it, so every op below proves
    // the seam (and the declaration itself passes the atomicity gate)
    spark.conf.set("spark.graft.fence.dir", "condput://locks")
    spark.conf.set("spark.graft.fence.locker.condput", "graft.CondPutLocker")
    try {
      Fence.acquire(spark, p, "writerA")
      assert(CondPutLocker.store.containsKey("condput://locks/" + p + "__fence"),
        "the fence must live in the locker's store, not on any filesystem")
      assert(Fence.holder(spark, p).exists(_.startsWith("writerA @ ")))
      // exclusivity THROUGH the locker: the second writer's conditional
      // put loses and the refusal carries holder + staleness as always
      val e = intercept[FenceHeldException](Fence.acquire(spark, p, "writerB"))
      assert(e.getMessage.contains("writerA") &&
        e.getMessage.contains("last heartbeat"))
      // heartbeat + staleness flow through the locker's clock
      Thread.sleep(60)
      val before = Fence.holderAgeMillis(spark, p).get
      Fence.heartbeat(spark, p, "writerA")
      assert(Fence.holderAgeMillis(spark, p).get < math.max(before, 1),
        "heartbeat must refresh the locker-held liveness clock")
      // release verifies the owner and clears the conditional-put entry
      intercept[IllegalArgumentException](Fence.release(spark, p, "writerB"))
      Fence.release(spark, p, "writerA")
      assert(Fence.holder(spark, p).isEmpty)
      // N-way race through the locker: putIfAbsent admits exactly one
      val start = new CountDownLatch(1)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (1 to 8).map(i => new Thread(() => {
        start.await()
        try { Fence.acquire(spark, p, s"w$i"); wins.incrementAndGet() }
        catch { case _: FenceHeldException => () }
      }))
      threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
      assert(wins.get() == 1, s"conditional-put must admit exactly one writer, got ${wins.get()}")
      assert(Fence.forceRelease(spark, p))
    } finally {
      spark.conf.unset("spark.graft.fence.dir")
      spark.conf.unset("spark.graft.fence.locker.condput")
      CondPutLocker.store.clear()
    }
  }

  test("ConditionalCreateLocker: refuses without the store capability; full lifecycle under the explicit assertion") {
    val p = "fence_ccl"
    val lockDir = java.nio.file.Files.createTempDirectory("ccl_locks").toString
    spark.conf.set("spark.graft.fence.dir", lockDir)
    spark.conf.set("spark.graft.fence.locker.file",
      "graft.operators.Fence$ConditionalCreateLocker")
    try {
      // the local connector advertises no conditional-create capability:
      // first use must refuse loudly naming the remedy, never silently
      // degrade to check-then-create
      val e = intercept[IllegalArgumentException](
        Fence.acquire(spark, p, "writerA"))
      assert(e.getMessage.contains("conditional") &&
        e.getMessage.contains("assumeConditionalCreate"), e.getMessage)
      // the deployment's deliberate assertion unlocks the locker; the
      // whole lifecycle then flows through the builder-API conditional
      // put: exclusive create with the tag IN the put, held-refusal,
      // re-put heartbeat (object stores reject mtime mutation), delete
      spark.conf.set("spark.graft.fence.assumeConditionalCreate", "true")
      Fence.acquire(spark, p, "writerA")
      assert(Fence.holder(spark, p).exists(_.startsWith("writerA @ ")))
      val held = intercept[FenceHeldException](Fence.acquire(spark, p, "writerB"))
      assert(held.getMessage.contains("writerA"))
      Thread.sleep(60)
      val before = Fence.holderAgeMillis(spark, p).get
      Fence.heartbeat(spark, p, "writerA")
      assert(Fence.holderAgeMillis(spark, p).get < math.max(before, 1),
        "re-put heartbeat must refresh the liveness clock")
      assert(Fence.holder(spark, p).exists(_.startsWith("writerA @ ")),
        "heartbeat re-put must preserve the tag")
      Fence.release(spark, p, "writerA")
      assert(Fence.holder(spark, p).isEmpty)
    } finally {
      spark.conf.unset("spark.graft.fence.dir")
      spark.conf.unset("spark.graft.fence.locker.file")
      spark.conf.unset("spark.graft.fence.assumeConditionalCreate")
    }
  }

  test("acquireWait retries ONLY the held-refusal: a non-held invariant violation surfaces immediately") {
    val p = "fence_broken"
    spark.conf.set("spark.graft.fence.dir", "broken://locks")
    spark.conf.set("spark.graft.fence.locker.broken", "graft.BrokenLocker")
    try {
      val t0 = System.nanoTime()
      val e = intercept[IllegalStateException](
        Fence.acquireWait(spark, p, "writerA", waitMs = 10000))
      assert(e.getMessage.contains("boom"))
      assert(!e.isInstanceOf[FenceHeldException])
      assert((System.nanoTime() - t0) / 1e6 < 5000,
        "a non-held IllegalStateException must not burn the wait budget")
    } finally {
      spark.conf.unset("spark.graft.fence.dir")
      spark.conf.unset("spark.graft.fence.locker.broken")
    }
  }

  test("viewfs is no longer builtin-atomic: a mount table can front s3a, so it must be declared") {
    val p = "fence_vf"
    spark.conf.set("spark.graft.fence.dir", "viewfs://cluster/locks")
    try {
      val e = intercept[IllegalStateException](Fence.acquire(spark, p, "writerA"))
      assert(e.getMessage.contains("viewfs") &&
        e.getMessage.contains("spark.graft.fence.atomicSchemes"),
        s"viewfs must refuse until declared: ${e.getMessage}")
      assert(!e.isInstanceOf[FenceHeldException])
      // an all-HDFS deployment declares it and the gate opens (the
      // failure past the gate is only the missing mount table here)
      spark.conf.set("spark.graft.fence.atomicSchemes", "viewfs")
      val e2 = intercept[Exception](Fence.acquire(spark, p, "writerA"))
      assert(!Option(e2.getMessage).getOrElse("").contains("no atomic create-exclusive"),
        s"a declared viewfs must pass the gate: ${e2.getMessage}")
    } finally {
      spark.conf.unset("spark.graft.fence.dir")
      spark.conf.unset("spark.graft.fence.atomicSchemes")
    }
  }

  test("tombstone add/deleteWhere arriving mid-compaction refuse loudly — a deletion is never dropped by the pass's clear") {
    val p = "fence_tb"
    cleanFamily(p)
    val pairsDir = java.nio.file.Files.createTempDirectory("fence_pairs4").toString
    try {
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      ingest(p, pairsDir, corpus, 0L)
      // the injected point: compact* snapshots tombstones via its
      // anti-join rewrites and DROPS the whole set at the end — a
      // deletion committed in between would silently resurrect, so the
      // tombstone writers hold the same fence and refuse instead
      Fence.acquire(spark, p, "compactMinhash")
      val e = intercept[IllegalStateException] {
        Tombstones.add(corpus.filter(col("doc_id") % 8 === 0).select("doc_id"),
          "doc_id", p)
      }
      assert(e.getMessage.contains("compactMinhash"))
      assert(!spark.catalog.tableExists(s"${p}_tombstones"),
        "a refused add must commit nothing")
      val e2 = intercept[IllegalStateException] {
        Tombstones.deleteWhere(corpus, "doc_id", p, col("doc_id") % 8 === 0)
      }
      assert(e2.getMessage.contains("compactMinhash"))
      Fence.release(spark, p, "compactMinhash")
      // the retried sweep lands, and the next pass folds it physically
      val n = Tombstones.deleteWhere(corpus, "doc_id", p, col("doc_id") % 8 === 0)
      assert(n == corpus.filter(col("doc_id") % 8 === 0).count())
      Tombstones.compactMinhash(spark, p)
      assert(!spark.catalog.tableExists(s"${p}_tombstones"))
      assert(spark.table(s"${p}_shingles")
        .filter(col("doc_id") % 8 === 0).count() == 0,
        "the folded sweep must be physical after compaction")
    } finally cleanFamily(p)
  }

  test("fence epoch: forceRelease bumps it; a forceRelease landing inside the heartbeat window kills the stale holder even when the tag bytes cannot") {
    val p = "fence_epoch"
    Fence.forceRelease(spark, p) // clear any stale fence from a prior run
    val e0 = Fence.epoch(spark, p)
    Fence.acquire(spark, p, "writerA")
    assert(Fence.forceRelease(spark, p))
    assert(Fence.epoch(spark, p) == e0 + 1,
      "every forceRelease must bump the fence epoch")
    // the advisory's window, deterministically injected: the stale
    // holder's heartbeat passes the tag verify, then — inside touch —
    // a forceRelease + a clobbering re-put of the SAME tag bytes land
    // (the object-store re-put race, where the new holder's tag was
    // overwritten and reads cannot tell the writers apart). Only the
    // epoch bracket can catch it — and must, loudly.
    spark.conf.set("spark.graft.fence.locker.file", "graft.EpochRaceLocker")
    try {
      Fence.acquire(spark, p, "writerA")
      var fired = 0
      EpochRaceLocker.midTouch = path => {
        if (fired == 0) {
          fired += 1
          val tag = Fence.HadoopLocker.readTag(spark, path).get
          Fence.forceRelease(spark, p) // operator presumes A dead
          // the stale re-put clobber: same bytes as A's own tag
          Fence.HadoopLocker.createExclusive(spark, path, tag)
        }
      }
      val e = intercept[IllegalStateException](
        Fence.heartbeat(spark, p, "writerA"))
      assert(fired == 1)
      assert(e.getMessage.contains("epoch"),
        s"the epoch bracket must catch the mid-beat forceRelease: ${e.getMessage}")
    } finally {
      EpochRaceLocker.midTouch = _ => ()
      spark.conf.unset("spark.graft.fence.locker.file")
      Fence.forceRelease(spark, p)
    }
  }

  test("ConditionalCreateLocker touch: a vanished fence refuses; a racing concurrent put deletes the fence and fails loudly on both sides") {
    val p = "fence_ccl2"
    val lockDir = java.nio.file.Files.createTempDirectory("ccl2_locks").toString
    spark.conf.set("spark.graft.fence.dir", lockDir)
    spark.conf.set("spark.graft.fence.locker.file",
      "graft.operators.Fence$ConditionalCreateLocker")
    spark.conf.set("spark.graft.fence.assumeConditionalCreate", "true")
    try {
      Fence.acquire(spark, p, "writerA")
      val fencePath = Fence.path(spark, p)
      val locker = new Fence.ConditionalCreateLocker()
      // vanished mid-beat (a forceRelease raced us): touch must refuse,
      // never recreate an ownerless fence from a blind re-put
      val fs = fencePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(fencePath, false)
      val gone = intercept[IllegalStateException](
        locker.touch(spark, fencePath))
      assert(gone.getMessage.contains("vanished"), gone.getMessage)
      assert(!fs.exists(fencePath),
        "a refused touch must not leave a recreated fence behind")
    } finally {
      spark.conf.unset("spark.graft.fence.dir")
      spark.conf.unset("spark.graft.fence.locker.file")
      spark.conf.unset("spark.graft.fence.assumeConditionalCreate")
    }
  }

  test("opt-in lease expiry: silent-past-TTL holder reclaimed (and self-kills at its next beat); within-TTL refuses; default-off refuses regardless of age") {
    def backdate(prefix: String, ms: Long): Unit = {
      val fp = Fence.path(spark, prefix)
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(fp.toUri.getPath),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - ms))
    }
    // DEFAULT OFF: a holder silent for "hours" still blocks loudly
    val p1 = "fence_lease_off"
    Fence.forceRelease(spark, p1)
    Fence.acquire(spark, p1, "deadWriter")
    backdate(p1, 3600000L)
    val off = intercept[FenceHeldException](Fence.acquire(spark, p1, "waiter"))
    assert(off.getMessage.contains("deadWriter") &&
      !off.getMessage.contains("Lease TTL"), off.getMessage)
    Fence.forceRelease(spark, p1)
    spark.conf.set("spark.graft.fence.leaseMs", "120000")
    try {
      // WITHIN TTL: refuses, and the refusal names the un-expired lease
      val p2 = "fence_lease_live"
      Fence.forceRelease(spark, p2)
      Fence.acquire(spark, p2, "liveWriter")
      val live = intercept[FenceHeldException](Fence.acquire(spark, p2, "waiter"))
      assert(live.getMessage.contains("Lease TTL"), live.getMessage)
      Fence.forceRelease(spark, p2)
      // PAST TTL: the waiter reclaims and becomes the holder; the stale
      // holder's next heartbeat dies on the epoch bump the reclaim made
      val p3 = "fence_lease_dead"
      Fence.forceRelease(spark, p3)
      Fence.acquire(spark, p3, "staleWriter")
      backdate(p3, 600000L)
      Fence.acquire(spark, p3, "reclaimer") // must NOT throw
      assert(Fence.holder(spark, p3).exists(_.startsWith("reclaimer @ ")),
        s"reclaim did not install the new holder: ${Fence.holder(spark, p3)}")
      val stale = intercept[IllegalStateException](
        Fence.heartbeat(spark, p3, "staleWriter"))
      assert(stale.getMessage.contains("held by") ||
        stale.getMessage.contains("epoch"), stale.getMessage)
      Fence.release(spark, p3, "reclaimer")
    } finally spark.conf.unset("spark.graft.fence.leaseMs")
  }
}
