package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print row count + head of every Verify output dir. */
object DumpOut {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/vout"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted.foreach { q =>
      val df = spark.read.parquet(s"$out/$q")
      println(s"--- $q rows=${df.count()} cols=${df.columns.mkString(",")}")
      df.show(3, 40)
    }
    spark.stop()
  }
}
