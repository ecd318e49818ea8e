package graft

import graft.operators.{Packing, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed pins for the sequence-packing fold and the int8
  * quantizer — the greedy recurrence and the rounding rule are the parts
  * a cross-engine oracle can only confirm wholesale; these specs pin each
  * branch individually.
  */
class PackingSpec extends AnyFunSuite {
  lazy val spark = Tables.session(4)
  import spark.implicits._

  test("greedy packing follows the first-fit recurrence exactly") {
    // budget 7: [3,4] fill bin0 to exactly 7 (boundary: NOT an overflow),
    // 5 opens bin1, oversized 9 opens its own bin, 2 opens the next
    val df = Seq((1L, 3), (2L, 4), (3L, 5), (4L, 9), (5L, 2))
      .toDF("doc_id", "tok")
    val got = Packing.packGreedy(df, "doc_id", "tok", budget = 7, segSize = 100)
      .orderBy("doc_id")
      .select("doc_id", "bin", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 0, 3), (2L, 0, 4), (3L, 1, 5),
      (4L, 2, 9), (5L, 3, 2)))
  }

  test("an oversized first doc occupies bin 0 alone (no infinite loop, no skip)") {
    val df = Seq((10L, 9), (11L, 3)).toDF("doc_id", "tok")
    val got = Packing.packGreedy(df, "doc_id", "tok", budget = 7, segSize = 100)
      .orderBy("doc_id").select("doc_id", "bin")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq == Seq((10L, 0), (11L, 1)))
  }

  test("segments pack independently and seq_id never collides across segments") {
    // 40 docs, segSize 8 → 5 segments; every doc token count 3, budget 7
    // → 2 docs per bin, 4 bins per segment
    val df = (0L until 40L).map(i => (i, 3)).toDF("doc_id", "tok")
    val out = Packing.packGreedy(df, "doc_id", "tok", budget = 7, segSize = 8)
    assert(out.count() == 40)
    val perSeq = out.groupBy("seq_id").agg(count(lit(1)).as("n"),
      sum("n_tokens").as("fill")).collect()
    assert(perSeq.length == 20) // 5 segments x 4 bins
    assert(perSeq.forall(r => r.getLong(1) == 2 && r.getLong(2) == 6))
    // the projection-computed per-sequence stats must equal a real
    // groupBy over the assignments (the stats avoid that second shuffle)
    val statsBad = out.filter(col("seq_fill") =!= 6 || col("seq_docs") =!= 2).count()
    assert(statsBad == 0)
    // determinism across runs (total-order discipline)
    val a = Packing.packGreedy(df, "doc_id", "tok", 7, 8).orderBy("doc_id").collect()
    val b = Packing.packGreedy(df, "doc_id", "tok", 7, 8).orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("int8 quantizer pins: codes, saturation, and the scale/2 error bound") {
    val df = Seq((1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
                 (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    val q1 = rows(0).getSeq[Int](rows(0).fieldIndex("qvec"))
    val scale1 = rows(0).getDouble(rows(0).fieldIndex("scale"))
    // scale = 1/127; 1.0 → 127 (amax saturates exactly), -0.5 → -63
    // (floor(-63.5 + 0.5)), 0.25 → 32 (floor(31.75 + 0.5)), 0 → 0
    assert(q1 == Seq(127, -63, 32, 0))
    assert(math.abs(scale1 - 1.0 / 127) < 1e-15)
    assert(rows(0).getDouble(rows(0).fieldIndex("max_err")) <= scale1 / 2 + 1e-15)
    // all-zero vector: zero codes, zero error, scale 0 (no NaN/div-zero)
    assert(rows(1).getSeq[Int](rows(1).fieldIndex("qvec")) == Seq(0, 0, 0, 0))
    assert(rows(1).getDouble(rows(1).fieldIndex("scale")) == 0.0)
    assert(rows(1).getDouble(rows(1).fieldIndex("max_err")) == 0.0)
  }

  test("mean-pool + normalize pins: hand-computed pooled vector, unit norm") {
    // two groups: group 0 pools [1,0] and [0,1] -> [0.5,0.5], norm
    // sqrt(0.5), unit [1/sqrt(2), 1/sqrt(2)]; group 1 is a single
    // all-zero chunk -> passes through unnormalized (no NaN)
    val df = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
                 (4L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
      .select(expr("vec_id DIV 4").as("g"), col("embedding"))
    val rows = Similarity.meanPoolNormalize(df, "g", "embedding")
      .orderBy("g").collect()
    val u0 = rows(0).getSeq[Double](rows(0).fieldIndex("unit"))
    assert(rows(0).getLong(rows(0).fieldIndex("n_chunks")) == 2)
    assert(math.abs(rows(0).getDouble(rows(0).fieldIndex("norm")) - math.sqrt(0.5)) < 1e-15)
    assert(u0.forall(x => math.abs(x - 1.0 / math.sqrt(2)) < 1e-15))
    assert(rows(1).getSeq[Double](rows(1).fieldIndex("unit")) == Seq(0.0, 0.0))
    assert(rows(1).getDouble(rows(1).fieldIndex("norm")) == 0.0)
    // corpus-wide invariant: every non-degenerate unit vector has norm 1
    val embs = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(expr("vec_id DIV 4").as("g"), col("embedding"))
    val bad = Similarity.meanPoolNormalize(embs, "g", "embedding")
      .filter(col("norm") > 0)
      .filter(abs(graft.operators.Similarity.l2norm(col("unit")) - 1.0) > 1e-12)
      .count()
    assert(bad == 0)
  }

  test("hashed linear scorer matches an independent plain-Scala reimplementation") {
    // the whole inference re-derived outside Spark: md5 via MessageDigest,
    // the same ascii polynomial, Knuth weights — every doc must agree on
    // bucket_sum exactly and on score to double precision
    val pows = Array(1L, 31L, 961L, 29791L, 923521L, 28629151L, 887503681L, 27512614111L)
    def bucket(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (0 until 8).map(i => hex(i).toInt * pows(i)).sum % 4096
    }
    def weight(b: Long): Double =
      ((b + 1) * 2654435761L) % 4294967296L / 4294967296.0 - 0.5
    val docsDf = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val expected = docsDf.collect().map { r =>
      val toks = r.getString(1).split(" ", -1)
      val bs = toks.map(bucket)
      (r.getLong(0), (toks.length, bs.sum, bs.map(weight).sum / toks.length))
    }.toMap
    val got = graft.operators.TextAnalysis
      .hashedLinearScore(docsDf, "doc_id", "text").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, bsum, score) = expected(r.getLong(0))
      assert(r.getInt(r.fieldIndex("n_tokens")) == n)
      assert(r.getLong(r.fieldIndex("bucket_sum")) == bsum,
        s"bucket drift at doc ${r.getLong(0)}")
      assert(math.abs(r.getDouble(r.fieldIndex("score")) - score) < 1e-12)
      assert(r.getString(r.fieldIndex("pred")) == (if (score > 0) "keep" else "drop"))
    }
  }

  test("quantizer error bound holds corpus-wide on real embeddings") {
    val embs = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val bad = Similarity.quantizeInt8(embs, "vec_id", "embedding")
      .filter(col("scale") > 0)
      .filter(col("max_err") > col("scale") / 2 + lit(1e-12) ||
        exists(col("qvec"), q => abs(q) > 127))
      .count()
    assert(bad == 0, "reconstruction error above scale/2 or code out of range")
  }
}
