package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Writer fencing for the persisted index families (round 11) — closes
  * the one operational seam the round-10 audit left open: both the
  * streaming ingest loops ([[graft.streaming.IngestLoop]], append-only
  * `ingest_batch` partitions) and the tombstone compactions
  * ([[Tombstones]] `compact*`, drop+recreate rewrites) were correct for
  * a SINGLE writer, but a compaction overlapping a live micro-batch
  * commit could silently lose that batch's append: the rewrite reads a
  * pre-append snapshot of the table, then drop+recreates it — the
  * concurrent partition vanishes with the old table. At 100 TB
  * ingestion is continuous and compaction is periodic, so the overlap
  * WILL happen unless writers are serialized.
  *
  * Mechanism: one fence file per family at
  * `<fence dir>/<prefix>__fence`, taken with a create-exclusive
  * (`overwrite=false`) call — atomic on HDFS (the namenode arbitrates a
  * single winner; the classic HDFS lock-file recipe) and NIO-atomic on
  * a local filesystem. Every family-mutating entry point — the
  * streaming ingest-batch paths, the `compact*` passes, the tombstone
  * add/deleteWhere commits, and the batch `save*Index` creators — takes
  * the fence for the duration of its write and releases it in a
  * finally: a second writer arriving while the fence is held REFUSES
  * LOUDLY (the repo's `requirePairBudget` discipline) naming the
  * holder, instead of corrupting the family. For the streaming loops
  * the thrown refusal fails the micro-batch; the checkpoint replays it
  * after the compaction releases — the batch's own retry contract
  * (drop-own-partition, corpus reads `ingest_batch < bid`) makes the
  * replay exact, so serialization costs availability for seconds, never
  * an append.
  *
  * OBJECT-STORE CONTRACT (round 12 — this was a scaladoc caveat, now an
  * enforced refusal): S3-style object stores have NO atomic
  * create-exclusive — their Hadoop connectors implement
  * `create(overwrite=false)` as a check-then-create, so two writers can
  * both "win" and the lost-append window the fence exists to close
  * silently reopens. [[acquire]] therefore checks the fence location's
  * scheme against an atomic allowlist (`file`, `hdfs`, `viewfs`,
  * `webhdfs`) BEFORE any filesystem call and refuses loudly on anything
  * else. Two escape hatches, both deliberate configuration rather than
  * silent degradation:
  *   - `spark.graft.fence.dir` — point the fence files at an atomic
  *     location (data on S3, fence on HDFS or a posix mount is a
  *     standard deployment shape); every fence operation routes there.
  *   - `spark.graft.fence.atomicSchemes` — comma-separated extra
  *     schemes whose create-exclusive IS atomic on your deployment
  *     (e.g. a store with real conditional-put semantics).
  *
  * Crash recovery: a holder that dies leaves the fence file behind, and
  * every subsequent writer refuses naming it — loud unavailability, not
  * silent loss, matching the family discipline everywhere else. The
  * fence records the holder's pid + host and the refusal reports how
  * long ago the holder last heart-beat (long-running holders refresh
  * the file mtime per stage via [[heartbeat]]) — "held, beating 3 s
  * ago" vs "held, silent for 2 h" is the signal an operator needs
  * before deciding the holder is dead. Recovery stays manual: after
  * confirming the holder is dead (for a crashed compaction, its
  * `__compact` leftovers also self-heal on the next pass), the operator
  * clears it with [[forceRelease]].
  */
object Fence {

  /** Schemes whose Hadoop `create(overwrite=false)` is a true atomic
    * create-exclusive: local posix (via NIO O_EXCL below), HDFS and its
    * views/proxies (the namenode arbitrates one winner). Everything
    * else — S3A, GCS, ABFS, ... — is check-then-create and MUST NOT
    * carry the fence (see object-store contract above). */
  private val builtinAtomicSchemes = Set("file", "hdfs", "viewfs", "webhdfs")

  private def allowedSchemes(spark: SparkSession): Set[String] =
    builtinAtomicSchemes ++ spark.conf
      .getOption("spark.graft.fence.atomicSchemes")
      .map(_.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)

  /** Where the family's fence file lives: `spark.graft.fence.dir` if
    * set (the S3-data / atomic-fence deployment shape), else the
    * session warehouse dir. */
  def path(spark: SparkSession, prefix: String): Path = {
    val base = spark.conf.getOption("spark.graft.fence.dir")
      .getOrElse(spark.conf.get("spark.sql.warehouse.dir"))
    new Path(new Path(base), s"${prefix}__fence")
  }

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The scheme the fence path resolves to, WITHOUT instantiating its
    * FileSystem (an s3a:// path must refuse by name, not by whatever
    * connector classes happen to be on the classpath). A scheme-less
    * path resolves against `fs.defaultFS`. */
  private def fenceScheme(spark: SparkSession, p: Path): String =
    Option(p.toUri.getScheme).getOrElse {
      Option(new Path(spark.sparkContext.hadoopConfiguration
        .get("fs.defaultFS", "file:///")).toUri.getScheme).getOrElse("file")
    }.toLowerCase

  private def requireAtomicScheme(spark: SparkSession, p: Path,
                                  owner: String): Unit = {
    val scheme = fenceScheme(spark, p)
    if (!allowedSchemes(spark).contains(scheme))
      throw new IllegalStateException(
        s"writer fence for [$owner] would live on scheme '$scheme' ($p), " +
          "which has no atomic create-exclusive: two writers could both " +
          "acquire and the lost-append window the fence exists to close " +
          "would silently reopen. Set spark.graft.fence.dir to an atomic " +
          "location (HDFS or a posix mount — data on the object store, " +
          "fence elsewhere, is the standard shape), or declare the scheme " +
          "atomic via spark.graft.fence.atomicSchemes if your store has " +
          "real conditional-put create semantics.")
  }

  /** The current holder tag (+ acquisition time, pid, host), if the
    * fence is held. */
  def holder(spark: SparkSession, prefix: String): Option[String] = {
    val p = path(spark, prefix)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val bytes = new Array[Byte](4096)
        val n = math.max(in.read(bytes), 0)
        Some(new String(bytes, 0, n, StandardCharsets.UTF_8).trim)
      } finally in.close()
    }
  }

  /** Milliseconds since the holder last proved liveness (acquire or
    * [[heartbeat]] — both stamp the fence file's mtime), if held. The
    * operator's staleness signal: a live compaction beats every stage,
    * so "silent for hours" means the holder is dead and
    * [[forceRelease]] is safe; "beat seconds ago" means it is not. */
  def holderAgeMillis(spark: SparkSession, prefix: String): Option[Long] = {
    val p = path(spark, prefix)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else Some(math.max(0L,
      System.currentTimeMillis() - f.getFileStatus(p).getModificationTime))
  }

  private def staleness(spark: SparkSession, prefix: String): String =
    holderAgeMillis(spark, prefix)
      .map(ms => f"last heartbeat ${ms / 1000.0}%.1f s ago")
      .getOrElse("liveness unknown")

  /** Refresh the fence file's mtime — the holder's liveness beacon.
    * Long-running holders (compaction stages, ingest batches) call this
    * between stages so [[holderAgeMillis]] distinguishes a working
    * holder from a crashed one. Verifies ownership first and never
    * recreates the file, so it cannot break exclusivity. */
  def heartbeat(spark: SparkSession, prefix: String, owner: String): Unit = {
    val p = path(spark, prefix)
    holder(spark, prefix) match {
      case Some(tag) if tag.startsWith(owner + " @ ") =>
        val qualified = fs(spark, p).makeQualified(p)
        if (qualified.toUri.getScheme == "file")
          java.nio.file.Files.setLastModifiedTime(
            java.nio.file.Paths.get(qualified.toUri.getPath),
            java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
        else fs(spark, p).setTimes(p, System.currentTimeMillis(), -1)
      case other =>
        throw new IllegalStateException(
          s"heartbeat for [$owner] on family '$prefix' but the fence is " +
            s"held by [${other.getOrElse("<nobody>")}] — the caller lost " +
            "(or never held) the fence; refusing to stamp liveness on " +
            "another writer's fence.")
    }
  }

  /** Take the family's writer fence or refuse loudly. `owner` is a
    * human-readable tag recorded in the fence file and named by any
    * refusal another writer hits while this one holds it. */
  def acquire(spark: SparkSession, prefix: String, owner: String): Unit = {
    val p = path(spark, prefix)
    requireAtomicScheme(spark, p, owner)
    val f = fs(spark, p)
    val tag = s"$owner @ ${java.time.Instant.ofEpochMilli(System.currentTimeMillis())}" +
      s" pid=${ProcessHandle.current().pid()}" +
      s" host=${java.net.InetAddress.getLocalHost.getHostName}"
    // `created` splits the failure modes (round-12 advisory): a
    // create-exclusive loss means HELD (refuse naming the holder); any
    // other IO failure AFTER our create succeeded must not leave a
    // half-written fence nobody can release — delete it and rethrow.
    var created = false
    try {
      val qualified = f.makeQualified(p)
      if (qualified.toUri.getScheme == "file") {
        // Hadoop's LocalFileSystem create(overwrite=false) is a
        // check-then-create (TOCTOU) — two same-JVM writers could both
        // win. NIO createFile is O_EXCL-atomic; the content write after
        // it is safe because the winner is already exclusive.
        val local = java.nio.file.Paths.get(qualified.toUri.getPath)
        if (local.getParent != null) java.nio.file.Files.createDirectories(local.getParent)
        java.nio.file.Files.createFile(local) // throws FileAlreadyExistsException
        created = true
        java.nio.file.Files.write(local, tag.getBytes(StandardCharsets.UTF_8))
      } else {
        // HDFS & compatible stores: create-exclusive is namenode-atomic
        // (non-atomic schemes were refused above, before any FS call)
        val out = f.create(p, /* overwrite = */ false)
        created = true
        try out.write(tag.getBytes(StandardCharsets.UTF_8)) finally out.close()
      }
    } catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        val held = holder(spark, prefix).getOrElse("<unreadable>")
        throw new IllegalStateException(
          s"writer fence for index family '$prefix' is held by [$held] " +
            s"(${staleness(spark, prefix)}); " +
            s"refusing to start [$owner] concurrently — a compaction " +
            "overlapping a live ingest commit can lose the batch's append. " +
            "Streaming micro-batches replay safely after the holder " +
            "releases; if the holder crashed, clear the fence with " +
            s"Fence.forceRelease (file: $p).")
      case e: java.io.IOException =>
        // a transient FS error, not a held fence: clean up our own
        // half-created file (if any) so the family is not left
        // permanently unavailable behind an ownerless fence, and let the
        // real failure surface instead of a misleading 'held' refusal
        if (created) {
          try f.delete(p, false) catch { case _: java.io.IOException => () }
        }
        throw e
    }
  }

  /** Release a fence this writer holds. Verifies the recorded owner tag
    * still starts with `owner` — releasing someone else's fence would
    * re-open the lost-append window the fence exists to close.
    *
    * The verify-then-delete is not atomic: if a [[forceRelease]] plus a
    * NEW writer's acquire both land between this writer's check and its
    * delete, the delete would remove the new holder's fence. That
    * interleaving requires an operator to forceRelease a fence whose
    * holder is still alive — which is exactly what the staleness
    * readout ([[holderAgeMillis]], heart-beaten by live holders) exists
    * to prevent: NEVER forceRelease a fence that beat recently. */
  def release(spark: SparkSession, prefix: String, owner: String): Unit = {
    val p = path(spark, prefix)
    val f = fs(spark, p)
    holder(spark, prefix) match {
      case None => // already gone (forceRelease raced us) — nothing to undo
      case Some(tag) =>
        require(tag.startsWith(owner + " @ "),
          s"writer fence for '$prefix' is held by [$tag], not [$owner]; " +
            "refusing to release another writer's fence.")
        f.delete(p, false)
    }
  }

  /** Manual recovery after a crashed holder: clear the fence
    * unconditionally. Returns true if a fence file was removed.
    * MUST NOT run while the named holder may still be alive — check
    * [[holderAgeMillis]] first (live holders heartbeat every stage). */
  def forceRelease(spark: SparkSession, prefix: String): Boolean = {
    val p = path(spark, prefix)
    fs(spark, p).delete(p, false)
  }

  /** [[acquire]], waiting up to `waitMs` for a live holder to release
    * before refusing — the shape a STREAMING writer wants: a foreachBatch
    * exception fails its whole query (the checkpoint replay the refusal
    * story leans on only happens when someone RESTARTS it), so a
    * micro-batch that overlaps a compaction should absorb seconds of
    * latency rather than die. Bounded and still loud: past the deadline
    * the held-refusal (holder + staleness) is thrown exactly as
    * [[acquire]] would. Non-atomic-scheme refusals are NOT retried —
    * waiting cannot make a check-then-create atomic. Exponential backoff
    * from 50 ms capped at 2 s keeps namenode chatter negligible. */
  def acquireWait(spark: SparkSession, prefix: String, owner: String,
                  waitMs: Long): Unit = {
    requireAtomicScheme(spark, path(spark, prefix), owner) // not retryable
    val deadline = System.currentTimeMillis() + math.max(waitMs, 0L)
    var delay = 50L
    var done = false
    while (!done) {
      try { acquire(spark, prefix, owner); done = true }
      catch {
        case e: IllegalStateException =>
          val left = deadline - System.currentTimeMillis()
          if (left <= 0) throw e
          Thread.sleep(math.min(delay, left))
          delay = math.min(delay * 2, 2000L)
      }
    }
  }

  /** How long [[withFence]] waits for a held fence before refusing:
    * `spark.graft.fence.waitMs`, default 0 (refuse immediately — the
    * loud-refusal default every spec pins). Deployments running live
    * ingest loops alongside periodic compaction set it to bound the
    * micro-batch latency a compaction window may add (e.g. 600000 for
    * 10 min) instead of letting the overlap kill the streaming query. */
  private def configuredWaitMs(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.fence.waitMs").map(_.toLong).getOrElse(0L)

  /** Run `body` holding the family's writer fence (waiting up to
    * `spark.graft.fence.waitMs` for a holder to release first). */
  def withFence[T](spark: SparkSession, prefix: String, owner: String)(body: => T): T = {
    val waitMs = configuredWaitMs(spark)
    if (waitMs > 0) acquireWait(spark, prefix, owner, waitMs)
    else acquire(spark, prefix, owner)
    try body finally release(spark, prefix, owner)
  }
}
