package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The held-fence refusal — a dedicated type so retry loops
  * ([[Fence.acquireWait]]) can distinguish "held, wait for the release"
  * from every other invariant violation raised inside an acquire (a
  * non-atomic scheme, a mid-wait conf change): only a HELD fence can be
  * released by waiting, so only this type is retried; anything else
  * surfaces immediately instead of burning the wait budget (round-13
  * advisory). Subtypes IllegalStateException so existing callers that
  * catch the broad type keep working. */
class FenceHeldException(message: String) extends IllegalStateException(message)

/** The store-specific primitive behind the writer fence: an atomic
  * create-exclusive plus the small read/touch/delete surface the fence
  * needs. The default ([[Fence.HadoopLocker]]) covers posix (NIO
  * O_EXCL) and HDFS (namenode-arbitrated create); deployments on a
  * store with REAL conditional-put semantics (e.g. S3's
  * `If-None-Match` conditional writes, GA since late 2024) plug their
  * own in via `spark.graft.fence.locker.<scheme>` — declaring a locker
  * for a scheme is the deployment's assertion that its create is
  * atomic, so the scheme also passes the allowlist gate. A locker class
  * must have a no-arg constructor; every method receives the session
  * (for Hadoop conf access — custom lockers may ignore it) and the
  * fence path. */
trait FenceLocker {
  /** Atomically create the fence file holding `tag`. MUST throw
    * [[java.nio.file.FileAlreadyExistsException]] or
    * [[org.apache.hadoop.fs.FileAlreadyExistsException]] if the fence
    * already exists, and must not leave a half-written fence behind on
    * any other failure (create-then-content implementations delete
    * their own partial file before rethrowing). */
  def createExclusive(spark: SparkSession, path: Path, tag: String): Unit
  /** The recorded holder tag, if the fence exists. */
  def readTag(spark: SparkSession, path: Path): Option[String]
  /** Milliseconds since the holder last proved liveness, if held. */
  def ageMillis(spark: SparkSession, path: Path): Option[Long]
  /** Refresh the liveness stamp (mtime) of an existing fence. */
  def touch(spark: SparkSession, path: Path): Unit
  /** Remove the fence file; true iff one existed. */
  def delete(spark: SparkSession, path: Path): Boolean
}

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
  * scheme against an atomic allowlist (`file`, `hdfs`, `webhdfs`)
  * BEFORE any filesystem call and refuses loudly on anything else.
  * `viewfs` is deliberately NOT in the builtin list (round-13
  * advisory): a viewfs mount table can front non-HDFS targets (e.g.
  * s3a), so its scheme alone proves nothing about the resolved store —
  * a deployment whose mounts are all-HDFS declares it explicitly.
  * Three escape hatches, all deliberate configuration rather than
  * silent degradation:
  *   - `spark.graft.fence.dir` — point the fence files at an atomic
  *     location (data on S3, fence on HDFS or a posix mount is a
  *     standard deployment shape); every fence operation routes there.
  *   - `spark.graft.fence.atomicSchemes` — comma-separated extra
  *     schemes whose create-exclusive IS atomic on your deployment
  *     (e.g. a viewfs whose mounts are all HDFS).
  *   - `spark.graft.fence.locker.<scheme>` — a [[FenceLocker]] class
  *     implementing the store's OWN conditional-put primitive (round
  *     13: the seam for S3 `If-None-Match`-style fencing without an
  *     HDFS/posix sidecar); declaring one both routes every fence
  *     operation for that scheme through it and passes the gate.
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
    * create-exclusive: local posix (via NIO O_EXCL in [[HadoopLocker]]),
    * HDFS and its HTTP proxy (the namenode arbitrates one winner).
    * Everything else — S3A, GCS, ABFS, and notably viewfs (its mounts
    * can front any store) — must be declared via conf or carry its own
    * [[FenceLocker]] (see object-store contract above). */
  private val builtinAtomicSchemes = Set("file", "hdfs", "webhdfs")

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

  /** EOF-complete tag read (round-14 advisory): a single `in.read()`
    * can short-read on object-store streams, truncating the tag and
    * causing a spurious heartbeat-mismatch abort — loop until EOF. */
  private[operators] def readTagFully(f: FileSystem, p: Path): Option[String] = {
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream(256)
        val bytes = new Array[Byte](4096)
        var n = in.read(bytes)
        while (n >= 0) {
          buf.write(bytes, 0, n)
          n = in.read(bytes)
        }
        Some(new String(buf.toByteArray, StandardCharsets.UTF_8).trim)
      } finally in.close()
    }
  }

  /** The fence EPOCH: a marker-file counter beside the fence
    * (`<prefix>__fence_epoch/e<N>`, value = max N listed — the
    * [[Tombstones.generation]] representation) bumped by every
    * [[forceRelease]]. Object-store lockers cannot make the liveness
    * re-put conditional (no generic If-Match), so a stale holder racing
    * a forceRelease + re-acquire could clobber the new holder's tag
    * with bytes indistinguishable from its own — the epoch is the
    * out-of-band signal tag bytes cannot carry: [[heartbeat]] brackets
    * each beat with two epoch reads, and ANY forceRelease landing
    * inside the bracket (or since the last beat) throws, so the stale
    * holder reliably dies within one beat instead of writing forever.
    * Marker creation is an atomic-enough single-file create on every
    * store (visibility via list); bumps are rare (manual recovery). */
  private def epochDir(spark: SparkSession, prefix: String): Path = {
    val f = path(spark, prefix)
    new Path(f.getParent, s"${prefix}__fence_epoch")
  }

  /** The filesystem behind the fence location, when one exists: a
    * custom locker may carry the fence on a scheme with NO Hadoop
    * FileSystem at all (a pure conditional-put store) — there the
    * epoch markers have nowhere to live and the bracket degrades to a
    * no-op (such a locker is the deployment's own atomic primitive;
    * making its touch conditional is its contract). Every real-store
    * deployment (posix/HDFS fence dir, or a conditional-create locker
    * over s3a/abfs/gcs) has the FS and gets the bracket. */
  private def epochFs(spark: SparkSession, d: Path): Option[FileSystem] =
    try Some(d.getFileSystem(spark.sparkContext.hadoopConfiguration))
    catch { case _: java.io.IOException => None }

  /** Current fence epoch for the family — 0 until a forceRelease ever
    * ran. Pure FS metadata (one list), no Spark job. */
  def epoch(spark: SparkSession, prefix: String): Long = {
    val d = epochDir(spark, prefix)
    epochFs(spark, d) match {
      case None => 0L
      case Some(fs) =>
        if (!fs.exists(d)) 0L
        else fs.listStatus(d).iterator.map(_.getPath.getName)
          .filter(n => n.length > 1 && n.startsWith("e") && n.drop(1).forall(_.isDigit))
          .map(_.drop(1).toLong).foldLeft(0L)(math.max)
    }
  }

  private def bumpEpoch(spark: SparkSession, prefix: String): Unit = {
    val d = epochDir(spark, prefix)
    epochFs(spark, d).foreach { fs =>
      fs.mkdirs(d)
      fs.create(new Path(d, s"e${epoch(spark, prefix) + 1L}"),
        /* overwrite = */ true).close()
    }
  }

  /** The scheme the fence path resolves to, WITHOUT instantiating its
    * FileSystem (an s3a:// path must refuse by name, not by whatever
    * connector classes happen to be on the classpath). A scheme-less
    * path resolves against `fs.defaultFS`. */
  private def fenceScheme(spark: SparkSession, p: Path): String =
    Option(p.toUri.getScheme).getOrElse {
      Option(new Path(spark.sparkContext.hadoopConfiguration
        .get("fs.defaultFS", "file:///")).toUri.getScheme).getOrElse("file")
    }.toLowerCase

  /** The default locker: NIO O_EXCL on local paths, Hadoop
    * create-exclusive on HDFS-compatible stores. Non-atomic schemes
    * never reach it — [[acquire]]'s gate refuses them first. */
  object HadoopLocker extends FenceLocker {
    private def fs(spark: SparkSession, p: Path): FileSystem =
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)

    override def createExclusive(spark: SparkSession, p: Path, tag: String): Unit = {
      val f = fs(spark, p)
      // `created` splits the failure modes (round-12 advisory): a
      // create-exclusive loss means HELD (rethrown as-is); any other IO
      // failure AFTER our create succeeded must not leave a half-written
      // fence nobody can release — delete it and rethrow.
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
          val out = f.create(p, /* overwrite = */ false)
          created = true
          try out.write(tag.getBytes(StandardCharsets.UTF_8)) finally out.close()
        }
      } catch {
        case e: java.io.IOException
            if !e.isInstanceOf[java.nio.file.FileAlreadyExistsException] &&
               !e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] =>
          // a transient FS error, not a held fence: clean up our own
          // half-created file (if any) so the family is not left
          // permanently unavailable behind an ownerless fence
          if (created) {
            try f.delete(p, false) catch { case _: java.io.IOException => () }
          }
          throw e
      }
    }

    override def readTag(spark: SparkSession, p: Path): Option[String] =
      Fence.readTagFully(fs(spark, p), p)

    override def ageMillis(spark: SparkSession, p: Path): Option[Long] = {
      val f = fs(spark, p)
      if (!f.exists(p)) None
      else Some(math.max(0L,
        System.currentTimeMillis() - f.getFileStatus(p).getModificationTime))
    }

    override def touch(spark: SparkSession, p: Path): Unit = {
      val f = fs(spark, p)
      val qualified = f.makeQualified(p)
      if (qualified.toUri.getScheme == "file")
        java.nio.file.Files.setLastModifiedTime(
          java.nio.file.Paths.get(qualified.toUri.getPath),
          java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      else f.setTimes(p, System.currentTimeMillis(), -1)
    }

    override def delete(spark: SparkSession, p: Path): Boolean =
      fs(spark, p).delete(p, false)
  }

  /** The shipped object-store [[FenceLocker]] (round 14 — the round-13
    * seam, now with a reference implementation): for stores whose
    * Hadoop connector maps `create(overwrite = false)` onto a REAL
    * conditional put — S3A on Hadoop 3.4.1+ with
    * `fs.s3a.create.conditional.enabled` (an `If-None-Match: *` PUT,
    * GA on S3 since late 2024), ABFS (conditional Create), GCS
    * (`x-goog-if-generation-match: 0`). Config example (data on s3a,
    * fence beside it, no HDFS/posix sidecar):
    * {{{
    * spark.graft.fence.locker.s3a = graft.operators.Fence$ConditionalCreateLocker
    * spark.hadoop.fs.s3a.create.conditional.enabled = true
    * }}}
    * Declaring the locker for a scheme is the deployment's atomicity
    * assertion and passes the allowlist gate — but this locker also
    * REFUSES AT FIRST USE unless the filesystem itself advertises a
    * conditional-create path capability (default probe list
    * `fs.option.create.conditional.overwrite` — the Hadoop 3.4.1+
    * option key S3A registers — overridable via
    * `spark.graft.fence.conditionalCapability`, comma-separated), so a
    * mis-pointed connector whose create is check-then-create fails
    * loudly instead of silently reopening the lost-append window. A
    * deployment whose connector implements conditional create but
    * predates the capability string asserts it explicitly with
    * `spark.graft.fence.assumeConditionalCreate = true`.
    *
    * `touch` re-puts the fence object with its current tag (object
    * stores reject mtime mutation): the overwrite refreshes
    * LastModified, and [[Fence.heartbeat]]'s post-stamp tag re-read
    * catches the theoretical clobber of a force-released-and-re-taken
    * fence, same as the HDFS path. */
  class ConditionalCreateLocker extends FenceLocker {
    private def fs(spark: SparkSession, p: Path): FileSystem =
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)

    private def requireConditional(spark: SparkSession, f: FileSystem, p: Path): Unit = {
      if (spark.conf.getOption("spark.graft.fence.assumeConditionalCreate")
            .contains("true")) return
      val caps = spark.conf
        .getOption("spark.graft.fence.conditionalCapability")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq("fs.option.create.conditional.overwrite"))
      require(caps.exists(c =>
        try f.hasPathCapability(p, c) catch { case _: Exception => false }),
        s"ConditionalCreateLocker is declared for '${p.toUri.getScheme}' but " +
          s"the filesystem advertises none of [${caps.mkString(", ")}]: its " +
          "create(overwrite=false) may be check-then-create, which silently " +
          "reopens the lost-append window the fence closes. Enable the " +
          "connector's conditional create (s3a: " +
          "fs.s3a.create.conditional.enabled on Hadoop 3.4.1+), point " +
          "spark.graft.fence.conditionalCapability at the capability your " +
          "connector registers, or assert it deliberately with " +
          "spark.graft.fence.assumeConditionalCreate=true.")
    }

    override def createExclusive(spark: SparkSession, p: Path, tag: String): Unit = {
      val f = fs(spark, p)
      requireConditional(spark, f, p)
      // the conditional PUT: the builder's overwrite(false) reaches the
      // store as If-None-Match-style create on capable connectors. On
      // S3A the content rides IN the conditional request (single object
      // PUT at close) so there is no half-written state — but ABFS
      // (conditional Create) and GCS materialize the object at CREATE
      // time (round-14 advisory), so a transient IO failure between
      // build() and close() there leaves an empty ownerless fence
      // blocking the family. Mirror HadoopLocker: on any non-held
      // failure after our create may have landed, best-effort delete
      // our own fence before rethrowing.
      var created = false
      try {
        val out = f.createFile(p).overwrite(false).build()
        created = true
        try out.write(tag.getBytes(StandardCharsets.UTF_8)) finally out.close()
      } catch {
        case e: java.io.IOException
            if !e.isInstanceOf[java.nio.file.FileAlreadyExistsException] &&
               !e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] =>
          if (created) {
            // `created` only proves OUR builder succeeded, not that our
            // bytes landed: on single-PUT-at-close stores (S3A) a
            // close() failure means no object ever existed, and the
            // file now at p may be a fence another writer legitimately
            // created in the failure window (round-15 advisory). Delete
            // only a fence carrying the tag THIS call wrote; a foreign
            // tag (or unreadable fence) stays intact — mutual exclusion
            // over cleanliness.
            try {
              if (Fence.readTagFully(f, p).contains(tag)) f.delete(p, false)
            } catch { case _: java.io.IOException => () }
          }
          throw e
      }
    }

    override def readTag(spark: SparkSession, p: Path): Option[String] =
      Fence.readTagFully(fs(spark, p), p)

    override def ageMillis(spark: SparkSession, p: Path): Option[Long] = {
      val f = fs(spark, p)
      if (!f.exists(p)) None
      else Some(math.max(0L,
        System.currentTimeMillis() - f.getFileStatus(p).getModificationTime))
    }

    /** Object stores reject mtime mutation, so the liveness stamp is a
      * re-put of the current tag. A non-conditional overwrite racing a
      * forceRelease + re-acquire could rewrite the NEW holder's tag
      * with the stale one (round-14 advisory) — without a store-level
      * If-Match this window is irreducible here, so the residual races
      * are made LOUD instead of silent: a vanished fence refuses (the
      * holder was force-released), the post-put re-read verifies our
      * own write landed intact (a concurrent writer's bytes there mean
      * two writers raced the fence — delete it and fail, forcing both
      * to re-arbitrate through createExclusive), and [[Fence.heartbeat]]
      * brackets the whole beat with the fence EPOCH check (bumped by
      * every forceRelease), which kills the stale holder on its next
      * beat even when the tag bytes alone cannot tell the writers
      * apart. Deployments needing the window closed entirely implement
      * a locker over the store's etag/If-Match conditional overwrite. */
    override def touch(spark: SparkSession, p: Path): Unit = {
      val f = fs(spark, p)
      val tag = Fence.readTagFully(f, p).getOrElse(
        throw new IllegalStateException(
          s"fence $p vanished mid-heartbeat: the holder was force-released " +
            "and must stop writing."))
      val out = f.createFile(p).overwrite(true).build()
      try out.write(tag.getBytes(StandardCharsets.UTF_8)) finally out.close()
      val back = Fence.readTagFully(f, p)
      if (!back.contains(tag)) {
        try f.delete(p, false) catch { case _: java.io.IOException => () }
        throw new IllegalStateException(
          s"fence $p heartbeat raced another writer's put (wrote [$tag], " +
            s"read back [${back.getOrElse("<gone>")}]): the fence was " +
            "deleted so both writers re-arbitrate through createExclusive; " +
            "this holder must stop writing.")
      }
    }

    override def delete(spark: SparkSession, p: Path): Boolean =
      fs(spark, p).delete(p, false)
  }

  /** Reflectively-loaded custom lockers, one instance per class —
    * lockers are stateless adapters over the store's API, so a single
    * instance serves every family. */
  private val customLockers =
    new java.util.concurrent.ConcurrentHashMap[String, FenceLocker]()

  /** The locker carrying fence operations for this path's scheme: the
    * deployment-declared one (`spark.graft.fence.locker.<scheme>`) if
    * present, else the builtin Hadoop/NIO locker. */
  private def lockerFor(spark: SparkSession, p: Path): FenceLocker =
    spark.conf.getOption(s"spark.graft.fence.locker.${fenceScheme(spark, p)}")
      .map { cls =>
        customLockers.computeIfAbsent(cls, c =>
          Class.forName(c).getDeclaredConstructor().newInstance()
            .asInstanceOf[FenceLocker])
      }
      .getOrElse(HadoopLocker)

  private def hasCustomLocker(spark: SparkSession, p: Path): Boolean =
    spark.conf.getOption(s"spark.graft.fence.locker.${fenceScheme(spark, p)}").isDefined

  private def requireAtomicScheme(spark: SparkSession, p: Path,
                                  owner: String): Unit = {
    val scheme = fenceScheme(spark, p)
    // a declared locker IS the atomicity assertion for its scheme: the
    // deployment plugged in the store's own conditional-put primitive
    if (hasCustomLocker(spark, p)) return
    if (!allowedSchemes(spark).contains(scheme))
      throw new IllegalStateException(
        s"writer fence for [$owner] would live on scheme '$scheme' ($p), " +
          "which has no atomic create-exclusive: two writers could both " +
          "acquire and the lost-append window the fence exists to close " +
          "would silently reopen. Set spark.graft.fence.dir to an atomic " +
          "location (HDFS or a posix mount — data on the object store, " +
          "fence elsewhere, is the standard shape), declare the scheme " +
          "atomic via spark.graft.fence.atomicSchemes if its create is " +
          "truly exclusive (e.g. a viewfs whose mounts are all HDFS), or " +
          "plug the store's own conditional-put in via " +
          s"spark.graft.fence.locker.$scheme.")
  }

  /** The current holder tag (+ acquisition time, pid, host), if the
    * fence is held. */
  def holder(spark: SparkSession, prefix: String): Option[String] = {
    val p = path(spark, prefix)
    lockerFor(spark, p).readTag(spark, p)
  }

  /** Milliseconds since the holder last proved liveness (acquire or
    * [[heartbeat]] — both stamp the fence file's mtime), if held. The
    * operator's staleness signal: a live compaction beats every stage,
    * so "silent for hours" means the holder is dead and
    * [[forceRelease]] is safe; "beat seconds ago" means it is not. */
  def holderAgeMillis(spark: SparkSession, prefix: String): Option[Long] = {
    val p = path(spark, prefix)
    lockerFor(spark, p).ageMillis(spark, p)
  }

  private def staleness(spark: SparkSession, prefix: String): String =
    holderAgeMillis(spark, prefix)
      .map(ms => f"last heartbeat ${ms / 1000.0}%.1f s ago")
      .getOrElse("liveness unknown")

  /** Refresh the fence file's mtime — the holder's liveness beacon.
    * Long-running holders (compaction stages, ingest batches, CC rounds)
    * call this between stages so [[holderAgeMillis]] distinguishes a
    * working holder from a crashed one. Verifies ownership first and
    * never recreates the file, so it cannot break exclusivity — and
    * RE-READS the holder tag after stamping (round-13 advisory): the
    * verify-then-stamp is not atomic, so a forceRelease plus a new
    * writer's acquire landing in between would let this (stale) holder
    * falsely reset the NEW holder's staleness clock. The post-stamp
    * re-read turns that silent falsification into a loud throw; the
    * new holder's next beat restores its true clock. */
  def heartbeat(spark: SparkSession, prefix: String, owner: String): Unit = {
    val p = path(spark, prefix)
    val locker = lockerFor(spark, p)
    // epoch bracket (round-14 advisory): a forceRelease bumps the fence
    // epoch, so one landing between the tag verify and the touch — the
    // window where an object-store locker's non-conditional re-put
    // could clobber the new holder's tag with indistinguishable bytes —
    // changes the second read and this (stale) holder dies loudly here
    // instead of silently surviving its own tag check.
    val e0 = epoch(spark, prefix)
    holder(spark, prefix) match {
      case Some(tag) if tag.startsWith(owner + " @ ") =>
        locker.touch(spark, p)
        val after = locker.readTag(spark, p)
        if (!after.exists(_ == tag))
          throw new IllegalStateException(
            s"heartbeat for [$owner] on family '$prefix' raced a " +
              s"forceRelease + re-acquire: the fence now reads " +
              s"[${after.getOrElse("<gone>")}] — this holder was force-" +
              "released and must stop writing; the stamped mtime belongs " +
              "to the new holder and its next beat corrects it.")
        if (epoch(spark, prefix) != e0)
          throw new IllegalStateException(
            s"heartbeat for [$owner] on family '$prefix' overlapped a " +
              "forceRelease (fence epoch changed mid-beat): this holder " +
              "was presumed dead and must stop writing — a new holder " +
              "may already own the fence.")
      case other =>
        throw new IllegalStateException(
          s"heartbeat for [$owner] on family '$prefix' but the fence is " +
            s"held by [${other.getOrElse("<nobody>")}] — the caller lost " +
            "(or never held) the fence; refusing to stamp liveness on " +
            "another writer's fence.")
    }
  }

  /** Opt-in lease TTL (round 16): `spark.graft.fence.leaseMs` > 0
    * lets an acquiring writer treat a holder whose heartbeat age
    * exceeds the TTL as dead and reclaim the fence AUTOMATICALLY
    * through the [[forceRelease]] path (epoch bump BEFORE delete — a
    * holder that was in fact alive sees the bump inside its next
    * heartbeat bracket and self-kills, the same guarantee manual
    * recovery relies on). Unset (the default) nothing expires: a dead
    * holder blocks the family loudly until an operator inspects
    * [[holderAgeMillis]] and force-releases — the conservative
    * default every spec pins. A deployment that opts in MUST size the
    * TTL several beats above its slowest fence-held stage: holders
    * beat per stage, so a TTL below one stage's wall time would
    * reclaim a LIVE writer (it dies at its next beat — no corruption,
    * but its batch work is wasted and replayed). */
  private def configuredLeaseMs(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.fence.leaseMs").map(_.toLong).getOrElse(0L)

  /** Take the family's writer fence or refuse loudly. `owner` is a
    * human-readable tag recorded in the fence file and named by any
    * refusal another writer hits while this one holds it. A HELD fence
    * throws [[FenceHeldException]] (retryable by waiting); every other
    * failure keeps its own type. With the opt-in lease TTL set, a
    * holder silent past the TTL is reclaimed instead (one attempt —
    * a reclaim that loses the re-acquire race refuses against the new
    * holder like any other waiter). */
  def acquire(spark: SparkSession, prefix: String, owner: String): Unit =
    acquireAttempt(spark, prefix, owner, reclaimTried = false)

  private def acquireAttempt(spark: SparkSession, prefix: String,
                             owner: String, reclaimTried: Boolean): Unit = {
    val p = path(spark, prefix)
    requireAtomicScheme(spark, p, owner)
    val tag = s"$owner @ ${java.time.Instant.ofEpochMilli(System.currentTimeMillis())}" +
      s" pid=${ProcessHandle.current().pid()}" +
      s" host=${java.net.InetAddress.getLocalHost.getHostName}"
    try lockerFor(spark, p).createExclusive(spark, p, tag)
    catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        val lease = configuredLeaseMs(spark)
        val age = holderAgeMillis(spark, prefix)
        if (!reclaimTried && lease > 0 && age.forall(_ > lease)) {
          // expired (or the fence vanished between the lost create and
          // the age read): reclaim via the bump-first forceRelease
          // path and retry ONCE — a lost re-acquire race refuses below
          forceRelease(spark, prefix)
          acquireAttempt(spark, prefix, owner, reclaimTried = true)
        } else {
          val held = holder(spark, prefix).getOrElse("<unreadable>")
          val leaseNote =
            if (lease > 0)
              s" Lease TTL ${lease} ms is set and the holder is within it" +
                s"${if (reclaimTried) " (post-reclaim re-acquire lost to a live writer)" else ""}."
            else ""
          throw new FenceHeldException(
            s"writer fence for index family '$prefix' is held by [$held] " +
              s"(${staleness(spark, prefix)});$leaseNote " +
              s"refusing to start [$owner] concurrently — a compaction " +
              "overlapping a live ingest commit can lose the batch's append. " +
              "Streaming micro-batches replay safely after the holder " +
              "releases; if the holder crashed, clear the fence with " +
              s"Fence.forceRelease (file: $p).")
        }
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
    holder(spark, prefix) match {
      case None => // already gone (forceRelease raced us) — nothing to undo
      case Some(tag) =>
        require(tag.startsWith(owner + " @ "),
          s"writer fence for '$prefix' is held by [$tag], not [$owner]; " +
            "refusing to release another writer's fence.")
        lockerFor(spark, p).delete(spark, p)
    }
  }

  /** Manual recovery after a crashed holder: clear the fence
    * unconditionally. Returns true if a fence file was removed.
    * MUST NOT run while the named holder may still be alive — check
    * [[holderAgeMillis]] first (live holders heartbeat every stage).
    * Bumps the fence [[epoch]] BEFORE deleting, so a holder that was
    * in fact alive sees the bump inside its next heartbeat bracket and
    * stops, even where an object-store locker's re-put could have
    * rewritten the tag bytes indistinguishably. */
  def forceRelease(spark: SparkSession, prefix: String): Boolean = {
    val p = path(spark, prefix)
    bumpEpoch(spark, prefix)
    lockerFor(spark, p).delete(spark, p)
  }

  /** [[acquire]], waiting up to `waitMs` for a live holder to release
    * before refusing — the shape a STREAMING writer wants: a foreachBatch
    * exception fails its whole query (the checkpoint replay the refusal
    * story leans on only happens when someone RESTARTS it), so a
    * micro-batch that overlaps a compaction should absorb seconds of
    * latency rather than die. Bounded and still loud: past the deadline
    * the held-refusal (holder + staleness) is thrown exactly as
    * [[acquire]] would. ONLY the held-refusal ([[FenceHeldException]])
    * is retried — waiting cannot fix a non-atomic scheme or any other
    * invariant violation, so those surface immediately instead of
    * burning the wait budget (round-13 advisory). Exponential backoff
    * from 50 ms capped at 2 s keeps namenode chatter negligible. */
  def acquireWait(spark: SparkSession, prefix: String, owner: String,
                  waitMs: Long): Unit = {
    val deadline = System.currentTimeMillis() + math.max(waitMs, 0L)
    var delay = 50L
    var done = false
    while (!done) {
      try { acquire(spark, prefix, owner); done = true }
      catch {
        case e: FenceHeldException =>
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
