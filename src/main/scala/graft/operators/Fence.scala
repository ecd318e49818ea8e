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
  * `<warehouse>/<prefix>__fence`, taken with a create-exclusive
  * (`overwrite=false`) call — atomic on HDFS (the namenode arbitrates a
  * single winner; the classic HDFS lock-file recipe) and NIO-atomic on
  * a local filesystem. NOTE: S3-style object stores have no atomic
  * create-exclusive — on those, point the warehouse at HDFS/a posix
  * mount for the fence, or front the families with a real lock service;
  * the fence narrows the overlap window there but cannot close it. Every
  * family-mutating entry point — the streaming ingest-batch paths, the
  * `compact*` passes, and the batch `save*Index` creators — takes the
  * fence for the duration of its write and releases it in a finally: a
  * second writer arriving while
  * the fence is held REFUSES LOUDLY (the repo's `requirePairBudget`
  * discipline) naming the holder, instead of corrupting the family.
  * For the streaming loops the thrown refusal fails the micro-batch;
  * the checkpoint replays it after the compaction releases — the
  * batch's own retry contract (drop-own-partition, corpus reads
  * `ingest_batch < bid`) makes the replay exact, so serialization
  * costs availability for seconds, never an append.
  *
  * Crash recovery: a holder that dies leaves the fence file behind, and
  * every subsequent writer refuses naming it — loud unavailability, not
  * silent loss, matching the family discipline everywhere else. The
  * refusal message carries the holder tag and acquisition time; after
  * confirming the holder is dead (for a crashed compaction, its
  * `__compact` leftovers also self-heal on the next pass), the operator
  * clears it with [[forceRelease]].
  */
object Fence {

  def path(spark: SparkSession, prefix: String): Path =
    new Path(new Path(spark.conf.get("spark.sql.warehouse.dir")),
      s"${prefix}__fence")

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The current holder tag (+ acquisition time), if the fence is held. */
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

  /** Take the family's writer fence or refuse loudly. `owner` is a
    * human-readable tag recorded in the fence file and named by any
    * refusal another writer hits while this one holds it. */
  def acquire(spark: SparkSession, prefix: String, owner: String): Unit = {
    val p = path(spark, prefix)
    val f = fs(spark, p)
    val tag = s"$owner @ ${java.time.Instant.ofEpochMilli(System.currentTimeMillis())}"
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
        java.nio.file.Files.write(local, tag.getBytes(StandardCharsets.UTF_8))
      } else {
        // HDFS & compatible stores: create-exclusive is namenode-atomic
        val out = f.create(p, /* overwrite = */ false)
        try out.write(tag.getBytes(StandardCharsets.UTF_8)) finally out.close()
      }
    } catch {
      case _: java.io.IOException =>
        val held = holder(spark, prefix).getOrElse("<unreadable>")
        throw new IllegalStateException(
          s"writer fence for index family '$prefix' is held by [$held]; " +
            s"refusing to start [$owner] concurrently — a compaction " +
            "overlapping a live ingest commit can lose the batch's append. " +
            "Streaming micro-batches replay safely after the holder " +
            "releases; if the holder crashed, clear the fence with " +
            s"Fence.forceRelease (file: $p).")
    }
  }

  /** Release a fence this writer holds. Verifies the recorded owner tag
    * still starts with `owner` — releasing someone else's fence would
    * re-open the lost-append window the fence exists to close. */
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
    * unconditionally. Returns true if a fence file was removed. */
  def forceRelease(spark: SparkSession, prefix: String): Boolean = {
    val p = path(spark, prefix)
    fs(spark, p).delete(p, false)
  }

  /** Run `body` holding the family's writer fence. */
  def withFence[T](spark: SparkSession, prefix: String, owner: String)(body: => T): T = {
    acquire(spark, prefix, owner)
    try body finally release(spark, prefix, owner)
  }
}
