package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-layout proof: two tables bucketed on the join key join
  * WITHOUT any exchange in the final plan (co-located reads), and the
  * result matches the plain shuffle join. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = Tables.session(4)
  val dir = "/root/testdata/sf0.001"

  test("same-bucketed tables join shuffle-free with identical results") {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Layout.writeBucketed(li, "li_bkt", "l_orderkey", 8)
    Layout.writeBucketed(ord, "ord_bkt", "l_orderkey", 8)
    // disable auto-broadcast: at test scale the small side would broadcast
    // (a BroadcastExchange) and hide the property under test — at real
    // scale neither side fits, so sort-merge over co-located buckets is
    // exactly the plan that matters
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Layout.bucketedJoin(spark, "li_bkt", "ord_bkt", "l_orderkey")
      val n = joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
      val plain = li.join(ord, "l_orderkey").count()
      assert(n == plain, s"bucketed join rows $n != plain join rows $plain")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }
}
