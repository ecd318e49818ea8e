package graft.tools

import graft.Tables
import graft.streaming.IngestLoop
import org.apache.spark.sql.functions._

/** Dev probe: the components family's read amplification under
  * continuous ingestion, and compactCc folding it flat — the evidence
  * rung for the delta log's LSM fold half (round 13).
  *
  * Usage: runMain graft.tools.CcCompactProbe <sfDir> [shards] [copies]
  *
  * Fixture: every doc id anchors a 2-node component (d — d+stride,
  * stride = max id + 1 so the ranges cannot collide), and every 10th
  * doc is star-joined to node 0 — ONE hot component holding ~20% of
  * all nodes, the big-quote-cluster shape. Each arriving shard adds a
  * single edge touching the hot component, so its delta re-appends the
  * full hot membership: superseded rows grow by O(hot) per shard while
  * the live catalog stays constant — the exact debt compactCc exists
  * to fold. After each shard the probe times a full ccComponents read
  * (count + component checksum); after `shards` arrivals it runs
  * compactCc, re-times the read, then appends three more shards to
  * show the post-fold read cost returns to (and stays at) the fresh
  * level while pre-fold it grew monotonically. `copies` id-shifts the
  * corpus for the ladder. */
object CcCompactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val shards = args.drop(1).headOption.map(_.toInt).getOrElse(12)
    val copies = args.drop(2).headOption.map(_.toInt).getOrElse(1)
    val spark = Tables.session(32)
    import spark.implicits._
    val prefix = "ccprobe"
    Seq("labels", "meta", "labels__compact")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$t"))
    graft.operators.Fence.forceRelease(spark, prefix)

    val baseIds = Tables(spark, dir, "documents").select(col("doc_id"))
    val copyStride = baseIds.agg(max("doc_id")).head.getLong(0) + 1L
    val ids = (0 until copies).map(k =>
      baseIds.select((col("doc_id") + k * copyStride).as("id")))
      .reduce(_ union _).localCheckpoint(true)
    val stride = copies * copyStride
    val pairEdges = ids.select(col("id").as("a_id"), (col("id") + stride).as("b_id"))
    val hotEdges = ids.filter(col("id") % 10 === 0 && col("id") > 0)
      .select(lit(0L).as("a_id"), col("id").as("b_id"))
    val batch0 = pairEdges.union(hotEdges).localCheckpoint(true)
    val hotSize = hotEdges.count() * 2 + 1
    println(s"[cccompact] nodes=${ids.count() * 2} hotComponent~=$hotSize shards=$shards copies=$copies ($dir)")

    def timeRead(label: String): Double = {
      val t0 = System.nanoTime()
      val r = IngestLoop.ccComponents(spark, prefix)
        .agg(count(lit(1)), sum(col("component"))).head()
      val s = (System.nanoTime() - t0) / 1e9
      val rows = spark.table(s"${prefix}_labels").count()
      println(f"[cccompact] $label%-28s read=$s%6.2f s  live=${r.getLong(0)}%d  tableRows=$rows%d")
      s
    }
    def shard(bid: Long): Unit =
      IngestLoop.ingestCcBatch(
        Seq((0L, 2L * stride + bid)).toDF("a_id", "b_id"),
        bid, "a_id", "b_id", prefix, buckets = 8)

    IngestLoop.ingestCcBatch(batch0, 0L, "a_id", "b_id", prefix, buckets = 8)
    timeRead("fresh (1 batch)")
    (1 to shards).foreach { k =>
      shard(k.toLong)
      if (k % math.max(shards / 4, 1) == 0 || k == shards)
        timeRead(s"pre-fold ($k shards)")
    }
    val t0 = System.nanoTime()
    IngestLoop.compactCc(spark, prefix)
    println(f"[cccompact] compactCc: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    timeRead("post-fold")
    ((shards + 1) to (shards + 3)).foreach { k =>
      shard(k.toLong)
      timeRead(s"post-fold (+${k - shards} shards)")
    }
    Seq("labels", "meta").foreach(t => spark.sql(s"DROP TABLE ${prefix}_$t"))
    spark.stop()
  }
}
