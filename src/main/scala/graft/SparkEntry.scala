package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-inventory IDs (SURVEY.md §2) to runnable
  * DataFrame builders over the testdata dir; `oracleSql` carries the
  * DuckDB-equivalent SQL for every SQL-expressible entry (hash-compared by
  * the driver at sf0.01). Non-SQL-expressible operators (ML, LSH, Tukey)
  * are present in `queries` only → rows-only check + ScalaTest coverage.
  */
object SparkEntry {

  /** Ordered catalog of all engine queries. */
  val catalog: Seq[(String, QueryDef)] =
    RelationalQueries.entries ++ StatsQueries.entries ++ TextQueries.entries ++
      MLQueries.entries

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    catalog.toMap.apply("q01_flagship").fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map { case (n, q) => n -> q.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.collect { case (n, q) if q.oracle.isDefined =>
      n -> q.oracle.get.linesIterator.map(_.trim).filter(_.nonEmpty).mkString(" ")
    }.toMap

  /** Headline subset timed by Bench (full catalog still verified). */
  def benchQueries: Seq[String] = catalog.map(_._1)
}
