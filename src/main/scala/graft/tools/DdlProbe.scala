package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._

/** Throwaway dev probe (round 17): per-operation driver-cost split of the
  * ingest-loop batch machinery — fence ops, SHOW PARTITIONS, DROP
  * PARTITION (absent + present), a tiny bucketed append, meta overwrite,
  * generation read — so the loop-row optimization targets measured cost,
  * not guesses. Usage: runMain graft.tools.DdlProbe <sfDir>
  */
object DdlProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session(32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](label: String, reps: Int = 5)(body: => A): Unit = {
      body // warm
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => body)
      println(f"[ddl] $label: ${(System.nanoTime() - t0) / 1e6 / reps}%.1f ms/op")
    }
    spark.sql("DROP TABLE IF EXISTS ddlp_t")
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val whFs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val loc = new org.apache.hadoop.fs.Path(wh, "ddlp_t")
    if (whFs.exists(loc)) whFs.delete(loc, true)

    val tiny = (0 until 500).map(i => (i.toLong, i % 8)).toDF("id", "b")
    t("bucketed append saveAsTable (500 rows, 8 buckets)", 3) {
      graft.operators.Layout.bucketAligned(tiny, 8, "id")
        .withColumn("ingest_batch", lit(0L))
        .write.mode("append").format("parquet").partitionBy("ingest_batch")
        .bucketBy(8, "id").sortBy("id").saveAsTable("ddlp_t")
    }
    t("SHOW PARTITIONS (present)") {
      spark.sql("SHOW PARTITIONS ddlp_t PARTITION (ingest_batch=0)").collect()
    }
    t("SHOW PARTITIONS (absent)") {
      spark.sql("SHOW PARTITIONS ddlp_t PARTITION (ingest_batch=99)").collect()
    }
    t("DROP PARTITION (absent)") {
      spark.sql("ALTER TABLE ddlp_t DROP IF EXISTS PARTITION (ingest_batch=99)")
    }
    t("table read + count") { spark.table("ddlp_t").count() }
    t("meta overwrite saveAsTable (1 row)", 3) {
      Seq(("id", 8)).toDF("id_col", "buckets")
        .write.mode("overwrite").format("parquet").saveAsTable("ddlp_meta")
    }
    t("fence acquire+release") {
      graft.operators.Fence.withFence(spark, "ddlp", "probe") { () }
    }
    t("heartbeat") { graft.operators.Fence.heartbeat(spark, "ddlp2", "probe") }
    t("generation read") {
      graft.operators.Tombstones.generation(spark, "ddlp")
    }
    t("localCheckpoint tiny frame") {
      tiny.localCheckpoint(true)
    }
    t("count on localCheckpointed") {
      val c = tiny.localCheckpoint(true); c.count()
    }
    spark.stop()
  }
}
