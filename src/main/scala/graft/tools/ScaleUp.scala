package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize an sf1-scale dataset by replicating the sf0.1
  * fact tables `factor` times with shifted keys (dims copied through),
  * for order-of-magnitude bench validation — the driver ships no sf1.
  *
  * Referential integrity: lineitem.l_orderkey shifts by the SAME constant
  * as orders.o_orderkey; o_custkey / dim keys are left alone (each copy
  * reuses the same customers — key skew grows, which is what a bigger SF
  * does anyway). Document text is perturbed per copy so the dedup /
  * shingle structure doesn't degenerate into 10-way exact duplicates.
  *
  * Usage: runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf1 10
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = Tables.session(32)

    def replicate(df: DataFrame, shiftCols: Seq[String], shift: Long,
                  perturb: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until factor).map { i =>
        val shifted = shiftCols.foldLeft(df)((d, c) =>
          d.withColumn(c, col(c) + lit(i * shift)))
        perturb(shifted, i)
      }.reduce(_.unionByName(_))

    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c).cast("long"))).head.getLong(0) + 1

    // dims: straight copies
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      Tables(spark, src, t).write.mode(SaveMode.Overwrite)
        .parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t copied")
    }

    val orders = Tables(spark, src, "orders")
    val orderShift = maxOf(orders, "o_orderkey")
    replicate(orders, Seq("o_orderkey"), orderShift)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/orders.parquet")
    println(s"[scaleup] orders x$factor (shift $orderShift)")

    val lineitem = Tables(spark, src, "lineitem")
    replicate(lineitem, Seq("l_orderkey"), orderShift)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/lineitem.parquet")
    println(s"[scaleup] lineitem x$factor (same shift)")

    val events = Tables(spark, src, "events")
    replicate(events, Seq("event_id"), maxOf(events, "event_id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/events.parquet")
    println(s"[scaleup] events x$factor")

    val docs = Tables(spark, src, "documents")
    replicate(docs, Seq("doc_id"), maxOf(docs, "doc_id"),
      (d, i) => if (i == 0) d
        else d.withColumn("text", concat(col("text"), lit(s" copyvariant$i"))))
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/documents.parquet")
    println(s"[scaleup] documents x$factor (text perturbed per copy)")

    val embs = Tables(spark, src, "embeddings")
    replicate(embs, Seq("vec_id"), maxOf(embs, "vec_id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/embeddings.parquet")
    println(s"[scaleup] embeddings x$factor")

    Tables.names.foreach { t =>
      println(s"[scaleup] $t rows: ${Tables(spark, dst, t).count()}")
    }
    spark.stop()
  }
}
