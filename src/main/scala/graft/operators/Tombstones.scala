package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deletion support for the persisted incremental index families
  * (MinHash / SimHash / containment / sign-LSH / IVF-PQ) — the LSM
  * discipline: a delete NEVER rewrites a corpus-scale bucketed table.
  * Instead the family keeps a `<prefix>_tombstones` side table of
  * deleted ids; every `load*Index` call anti-joins its id-bearing
  * frames against it (broadcast — the probe side keeps its bucketed
  * partitioning, so the co-located candidate joins stay exchange-free
  * on the corpus side), and a periodic [[compactMinhash]]-family pass
  * folds the tombstones into a physical rewrite and clears them. At
  * 100 TB this is the only viable shape: deletion requests arrive
  * continuously and are tiny relative to the corpus; rewriting a
  * petabyte-scale codes/bands table per delete batch is not a plan.
  *
  * Semantics: a tombstoned id is invisible to every consumer of the
  * loaded index (serving, incremental pair mining, streaming gates)
  * from the moment [[add]] commits, including rows a replayed or later
  * ingest batch re-appends for that id; compaction makes the deletion
  * physical and resets the tombstone set. The tombstone set must stay
  * broadcast-sized between compactions — that is the compaction
  * cadence contract, mirroring Delta/Iceberg delete-vector practice. */
object Tombstones {

  def table(prefix: String): String = s"${prefix}_tombstones"

  /** Record `ids` (any single-keyed frame; `idCol` names the key) as
    * deleted for the `prefix` family. Append-only and idempotent in
    * effect: duplicate ids across calls are collapsed by the distinct
    * in [[filter]]. */
  def add(ids: DataFrame, idCol: String, prefix: String): Unit =
    ids.select(col(idCol).as("id")).distinct()
      .write.mode("append").format("parquet").saveAsTable(table(prefix))

  /** The family's tombstoned ids, if any exist. */
  def ids(spark: SparkSession, prefix: String): Option[DataFrame] =
    if (spark.catalog.tableExists(table(prefix))) Some(spark.table(table(prefix)))
    else None

  /** Anti-join `df` against the family's tombstone set — identity when
    * the family has none. Broadcast by construction: the tombstone side
    * is the (small) deletion set, and a broadcast anti-join preserves
    * the probe side's (bucketed) output partitioning, so downstream
    * candidate joins keep reading the corpus co-located. */
  def filter(df: DataFrame, idCol: String, prefix: String): DataFrame =
    ids(df.sparkSession, prefix) match {
      case None => df
      case Some(t) =>
        df.join(broadcast(t.select(col("id").as(idCol)).distinct()),
          Seq(idCol), "left_anti")
    }

  private def clear(spark: SparkSession, prefix: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${table(prefix)}")

  /** Rewrite one bucketed family table minus the tombstoned rows,
    * preserving its bucket/sort layout (and the `ingest_batch`
    * partitioning if the table grew through an [[graft.streaming.IngestLoop]]).
    * Two disk-to-disk writes: survivors land in a temp table first
    * (fresh lineage), then overwrite the original from it — the shape
    * that holds at corpus scale, where an eager checkpoint of the whole
    * table would pin it in executor storage, and an ALTER-RENAME swap
    * of a partitioned managed table is not metastore-portable (this
    * catalog's rename leaves partition locations at the old path).
    * `buckets` must match the family's original bucket count — the
    * layout is the join-co-location contract, so compaction must not
    * change it. */
  private def rewriteMinus(spark: SparkSession, tbl: String, idColInTbl: String,
                           prefix: String, buckets: Int,
                           bucketCols: Seq[String]): Unit = {
    val src = spark.table(tbl)
    val partitioned = src.columns.contains("ingest_batch")
    val tmp = tbl + "__compact"
    def write(df: org.apache.spark.sql.DataFrame, to: String): Unit = {
      val w0 = df.write.mode("overwrite").format("parquet")
      val w1 = if (partitioned) w0.partitionBy("ingest_batch") else w0
      w1.bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
        .sortBy(bucketCols.head, bucketCols.tail: _*)
        .saveAsTable(to)
    }
    write(filter(src, idColInTbl, prefix), tmp)
    write(spark.table(tmp), tbl)
    spark.sql(s"DROP TABLE $tmp")
  }

  private def metaIdCol(spark: SparkSession, prefix: String): String =
    spark.table(s"${prefix}_meta").head().getString(0)

  /** Fold the tombstones into the MinHash family's physical tables and
    * clear them. `buckets` = the count [[Dedup.saveMinhashIndex]] /
    * the ingest loop wrote with. */
  def compactMinhash(spark: SparkSession, prefix: String, buckets: Int = 64): Unit = {
    val idCol = metaIdCol(spark, prefix)
    rewriteMinus(spark, s"${prefix}_bands", idCol, prefix, buckets, Seq("band", "bucket"))
    rewriteMinus(spark, s"${prefix}_shingles", idCol, prefix, buckets, Seq(idCol))
    clear(spark, prefix)
  }

  /** [[compactMinhash]] for the SimHash family. */
  def compactSimhash(spark: SparkSession, prefix: String, buckets: Int = 64): Unit = {
    val idCol = metaIdCol(spark, prefix)
    rewriteMinus(spark, s"${prefix}_chunked", idCol, prefix, buckets, Seq("chunk", "ckey"))
    clear(spark, prefix)
  }

  /** [[compactMinhash]] for the containment family (internal id column
    * is the normalized `id`). */
  def compactContainment(spark: SparkSession, prefix: String, buckets: Int = 64): Unit = {
    rewriteMinus(spark, s"${prefix}_posting", "id", prefix, buckets, Seq("gram"))
    rewriteMinus(spark, s"${prefix}_base", "id", prefix, buckets, Seq("id"))
    clear(spark, prefix)
  }

  /** [[compactMinhash]] for the sign-LSH embedding family. */
  def compactEmbed(spark: SparkSession, prefix: String, buckets: Int = 64): Unit = {
    rewriteMinus(spark, s"${prefix}_hashed", "id", prefix, buckets, Seq("t", "h"))
    rewriteMinus(spark, s"${prefix}_vecs", "id", prefix, buckets, Seq("id"))
    clear(spark, prefix)
  }

  /** [[compactMinhash]] for the IVF-PQ serving family. */
  def compactPq(spark: SparkSession, prefix: String, buckets: Int = 16): Unit = {
    rewriteMinus(spark, s"${prefix}_codes", "c_id", prefix, buckets, Seq("cell"))
    clear(spark, prefix)
  }

  /** [[compactMinhash]] for the semantic-dedup family. */
  def compactSem(spark: SparkSession, prefix: String, buckets: Int = 16): Unit = {
    rewriteMinus(spark, s"${prefix}_docs", "id", prefix, buckets, Seq("cell"))
    clear(spark, prefix)
  }
}
