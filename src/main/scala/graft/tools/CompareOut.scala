package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: row-level diff of two Verify output dirs (refactor safety). */
object CompareOut {
  def main(args: Array[String]): Unit = {
    val Array(a, b) = args.take(2)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = new java.io.File(a).listFiles().filter(_.isDirectory).map(_.getName).sorted
    var bad = 0
    var errs = 0
    names.foreach { q =>
      try {
        val da = spark.read.parquet(s"$a/$q")
        val db = spark.read.parquet(s"$b/$q")
        val d1 = da.exceptAll(db).count()
        val d2 = db.exceptAll(da).count()
        if (d1 != 0 || d2 != 0) { bad += 1; println(s"DIFF $q: a-b=$d1 b-a=$d2") }
      } catch { case e: Exception => errs += 1; println(s"ERR $q: ${e.getMessage.take(100)}") }
    }
    // errs != 0 means a side was missing/unreadable — NOT a clean compare
    println(s"compared ${names.length} queries, $bad diffs, $errs errors")
    spark.stop()
  }
}
