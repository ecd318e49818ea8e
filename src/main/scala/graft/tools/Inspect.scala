package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: dump schema, null counts, and sample values of the driver
  * testdata so oracle SQL can be written with eyes open. Not part of the
  * engine surface. Run: sbt "runMain graft.tools.Inspect /root/testdata/sf0.001"
  */
object Inspect {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = graft.Tables.names
    tables.foreach { t =>
      val df = spark.read.parquet(s"$dir/$t.parquet")
      println(s"=== $t rows=${df.count()} ===")
      df.printSchema()
      val nulls = df.columns.map(c => sum(col(c).isNull.cast("long")).as(c))
      println("nulls: " + df.agg(nulls.head, nulls.tail: _*).first())
      df.show(3, 60, vertical = true)
    }
    // JSON props shape
    val ev = spark.read.parquet(s"$dir/events.parquet")
    println("props samples:")
    ev.select("props").distinct().show(8, 200)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println("doc text sample:")
    docs.select(col("doc_id"), substring(col("text"), 1, 200), col("lang"), col("source")).show(5, 220)
    println("langs: "); docs.groupBy("lang").count().show()
    println("sources: "); docs.groupBy("source").count().show()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    println("embedding dim: ")
    emb.select(size(col("embedding")).as("dim")).groupBy("dim").count().show()
    spark.stop()
  }
}
