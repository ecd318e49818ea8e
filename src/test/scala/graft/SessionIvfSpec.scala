package graft

import graft.operators.{Sessionize, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sessionization equivalence (manual lag/cumsum vs native
  * session_window) and IVF ANN recall vs the exact baseline. */
class SessionIvfSpec extends AnyFunSuite {
  lazy val spark = Tables.session(4)
  val dir = "/root/testdata/sf0.001"

  test("manual sessions == session_window partitioning (count and bounds)") {
    val gapNs = 1800000000000L
    val events = Tables.events(spark, dir)
    val manual = Sessionize.manualSessions(events, "user_id", "ts", "event_id", gapNs)
      .groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("n_events"), min("ts").as("s_ns"), max("ts").as("e_ns"))
    val native = Sessionize.gapSessions(events, "user_id", "ts_ts", "30 minutes")
    // same number of sessions per user
    val m = manual.groupBy("user_id").count().withColumnRenamed("count", "m")
    val n = native.groupBy("user_id").count().withColumnRenamed("count", "n")
    val diff = m.join(n, "user_id").filter(col("m") =!= col("n")).count()
    assert(diff == 0, "session counts diverge between manual and session_window")
    // same event partitioning: total events in sessions match
    assert(manual.agg(sum("n_events")).head().getLong(0) ==
      native.agg(sum("n_events")).head().getLong(0))
    // session starts agree (ns -> micros truncation)
    val mStarts = manual.select(expr("s_ns div 1000").as("us")).orderBy("us")
      .collect().map(_.getLong(0))
    val nStarts = native.select(unix_micros(col("sess_start")).as("us")).orderBy("us")
      .collect().map(_.getLong(0))
    assert(mStarts.sameElements(nStarts))
  }

  test("IVF ANN: structural top-k and reasonable recall vs exact") {
    val e = Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding")
      .collect()
    // 10 hits per query, rank-ordered
    assert(ivf.length == 50)
    val byQ = ivf.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val cos = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    val ivfPairs = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivfPairs.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.2, s"IVF recall $recall unreasonably low")
    // determinism
    val again = Similarity.ivfTopK(e, q, "vec_id", "embedding").collect()
    assert(ivf.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("lshDupPairs == exact cosineDupPairs on the dup-bearing corpus (recall 1.0)") {
    // the q45 shape: id-shifted copy creates exact-duplicate pairs, which
    // collide in every sign-LSH table by construction; the bucketed plan
    // must reproduce the exact all-pairs answer row for row
    val base = Tables(spark, dir, "embeddings").select("vec_id", "embedding")
    val shifted = base.withColumn("vec_id", col("vec_id") + 10000000L)
    val corpus = base.union(shifted).cache()
    val exact = Similarity.cosineDupPairs(corpus, "vec_id", "embedding", 0.9)
      .orderBy("a_id", "b_id").collect().map(_.toString)
    val bucketed = Similarity.lshDupPairs(corpus, "vec_id", "embedding", 0.9)
      .orderBy("a_id", "b_id").collect().map(_.toString)
    assert(exact.nonEmpty, "corpus must contain duplicate pairs")
    assert(bucketed.sameElements(exact),
      s"bucketed plan diverges: exact=${exact.length} bucketed=${bucketed.length}")
    corpus.unpersist()
  }

  test("LSH ANN: candidate pruning with reasonable recall vs exact") {
    val e = Tables(spark, dir, "embeddings").cache()
    val exact = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(e, "vec_id", "embedding", k = 5).collect()
    val lshPairs = lsh.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = lshPairs.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.4, s"LSH recall $recall unreasonably low")
    // determinism (seeded hyperplanes)
    val again = Similarity.lshTopK(e, "vec_id", "embedding", k = 5).collect()
    assert(lsh.map(_.toString).sameElements(again.map(_.toString)))
    e.unpersist()
  }
}
