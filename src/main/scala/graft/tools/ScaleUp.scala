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
  * An optional 4th arg `zipf` produces the SKEWED variant — realistic
  * hot keys instead of uniform replication, to exercise the salting /
  * hot-bucket paths:
  *  - lineitem.l_suppkey remapped through a power-law rank (density
  *    ∝ 1/rank, Zipf(1)): the top supplier owns a double-digit share of
  *    all lineitem rows — the celebrity key q65's salted join must fan
  *    out;
  *  - ~1% of documents (chosen by ORIGINAL doc_id, so the same docs in
  *    every copy) get one shared hot text: a factor-way exact-dup
  *    clique creating hot MinHash/SimHash band buckets for q33/q34;
  *  - ~5% of embeddings per copy get one shared hot vector: a single
  *    mega-bucket in every LSH table for q44/q45.
  *
  * Usage: runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf1 10 [zipf]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val zipf = args.length > 3 && args(3) == "zipf"
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
    val liRep = replicate(lineitem, Seq("l_orderkey"), orderShift)
    val liOut = if (!zipf) liRep else {
      // Zipf(1) over supplier ranks: u uniform from a row hash,
      // rank = floor(S^u) has density ∝ 1/rank — rank 1 (the hottest
      // supplier) gets ~1/ln(S) of ALL rows (~14% at S=1000)
      val sMin = Tables(spark, src, "supplier")
        .agg(min(col("s_suppkey").cast("long"))).head.getLong(0)
      val sCnt = Tables(spark, src, "supplier").count()
      val u = pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(1000000L))
        .cast("double") / lit(1000000.0)
      liRep.withColumn("l_suppkey",
        (lit(sMin) + least(lit(sCnt - 1), floor(pow(lit(sCnt.toDouble), u)) - 1L))
          .cast(liRep.schema("l_suppkey").dataType))
    }
    liOut.write.mode(SaveMode.Overwrite).parquet(s"$dst/lineitem.parquet")
    println(s"[scaleup] lineitem x$factor (same shift${if (zipf) ", zipf l_suppkey" else ""})")

    val events = Tables(spark, src, "events")
    replicate(events, Seq("event_id"), maxOf(events, "event_id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/events.parquet")
    println(s"[scaleup] events x$factor")

    val docs = Tables(spark, src, "documents")
    val docShift = maxOf(docs, "doc_id")
    val hotText = ("hot boilerplate page about shared content delivery " +
      "networks and mirrored articles that appear on every host in the " +
      "crawl frontier with identical wording every single time").trim
    replicate(docs, Seq("doc_id"), docShift,
      (d, i) => {
        val base = if (i == 0) d
          else d.withColumn("text", concat(col("text"), lit(s" copyvariant$i")))
        if (!zipf) base
        // select by ORIGINAL id so the same ~1% of docs go hot in every
        // copy → a factor-way exact-dup clique (hot band buckets)
        else base.withColumn("text",
          when(pmod(xxhash64(col("doc_id") - lit(i * docShift)), lit(100)) < 1,
            lit(hotText)).otherwise(col("text")))
      })
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/documents.parquet")
    println(s"[scaleup] documents x$factor (text perturbed per copy" +
      s"${if (zipf) ", 1% hot-text clique" else ""})")

    val embs = Tables(spark, src, "embeddings")
    replicate(embs, Seq("vec_id"), maxOf(embs, "vec_id"),
      (d, _) => if (!zipf) d
        // one shared vector for ~5% of rows: a single mega-bucket in
        // every LSH table (the celebrity embedding)
        else d.withColumn("embedding",
          when(pmod(xxhash64(col("vec_id")), lit(100)) < 5,
            expr("transform(embedding, x -> CAST(0.25 AS FLOAT))"))
            .otherwise(col("embedding"))))
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/embeddings.parquet")
    println(s"[scaleup] embeddings x$factor${if (zipf) " (5% hot vector)" else ""}")

    Tables.names.foreach { t =>
      println(s"[scaleup] $t rows: ${Tables(spark, dst, t).count()}")
    }
    spark.stop()
  }
}
