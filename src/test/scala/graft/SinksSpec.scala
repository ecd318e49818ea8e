package graft

import graft.operators.MLOps
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sink coverage (SURVEY §2.1 S3/S4): CSV sink with header (write_csv
  * analog), parquet sink, and ML model persistence (saveRDS analog →
  * PipelineModel.save/load roundtrip).
  */
class SinksSpec extends AnyFunSuite {
  lazy val spark = Tables.session(4)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("S3: CSV sink roundtrips with header (single file like write_csv)") {
    val df = Tables(spark, "/root/testdata/sf0.001", "nation")
    val out = tmp("csv_sink") + "/nation"
    df.coalesce(1).write.option("header", "true").mode("overwrite").csv(out)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    assert(back.count() == df.count())
    assert(back.columns.toSeq == df.columns.toSeq)
    val a = df.orderBy("n_nationkey").collect().map(_.toString)
    val b = back.orderBy("n_nationkey").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("S3: parquet sink preserves types exactly") {
    val df = Tables(spark, "/root/testdata/sf0.001", "customer")
    val out = tmp("pq_sink") + "/customer"
    df.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.schema == df.schema)
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
  }

  test("S4: PipelineModel save/load roundtrip predicts identically") {
    val df = Tables(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey").cast("double").as("nk"))
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(Array("c_acctbal", "nk")).setOutputCol("features"),
      new KMeans().setK(3).setSeed(123L).setFeaturesCol("features").setPredictionCol("cluster")))
    val model = pipe.fit(df)
    val out = tmp("model_sink") + "/km"
    model.write.overwrite().save(out)
    val loaded = PipelineModel.load(out)
    val orig = model.transform(df).select("c_custkey", "cluster")
      .orderBy("c_custkey").collect().map(_.toString)
    val again = loaded.transform(df).select("c_custkey", "cluster")
      .orderBy("c_custkey").collect().map(_.toString)
    assert(orig.sameElements(again))
  }

  test("P10: schema padding / union-by-name semantics (missing test cols -> 0)") {
    import spark.implicits._
    val train = Seq((1.0, 2.0, 3.0)).toDF("a", "b", "c")
    val test = Seq((4.0, 5.0)).toDF("a", "c")
    val missing = train.columns.filterNot(test.columns.contains)
    val padded = missing.foldLeft(test)((d, c) => d.withColumn(c, lit(0.0)))
      .select(train.columns.map(col).toIndexedSeq: _*)
    assert(padded.columns.toSeq == train.columns.toSeq)
    assert(padded.head().getDouble(1) == 0.0)
    // and the built-in analog
    val ub = train.unionByName(test, allowMissingColumns = true)
    assert(ub.count() == 2 && ub.filter(col("b").isNull).count() == 1)
  }

  test("JSONL sink/source roundtrips losslessly, including escapes, unicode and gzip") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // adversarial strings: quotes, backslashes, embedded newline/tab,
    // unicode beyond the BMP, leading/trailing spaces, empty string —
    // a JSONL hop in a dedup pipeline must not perturb any byte
    val rows = Seq(
      (1L, "a", """he said "hi" \ and left"""),
      (2L, "a", "line one\nline two\ttabbed"),
      (3L, "b", "emoji 😃 and accents éü"),
      (4L, "b", "  padded  "),
      (5L, "c", ""))
    val df = rows.toDF("doc_id", "source", "text")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("source", StringType), StructField("text", StringType)))
    for (compress <- Seq(true, false)) {
      val out = tmp("jsonl_sink") + s"/docs_$compress"
      graft.operators.Jsonl.write(df, out, compress)
      if (compress) {
        val files = new java.io.File(out).listFiles().map(_.getName)
        assert(files.exists(_.endsWith(".json.gz")), files.mkString(","))
      }
      val back = graft.operators.Jsonl.read(spark, out, schema)
      assert(back.schema == schema)
      val a = df.orderBy("doc_id").collect().map(_.toSeq)
      val b = back.orderBy("doc_id").collect().map(_.toSeq)
      assert(a.sameElements(b), s"roundtrip diverged (compress=$compress)")
    }
    // explicit-schema column pruning: a 2-column read parses only the
    // requested fields — no inference pass, no full-row materialization
    val out2 = tmp("jsonl_sink") + "/pruned"
    graft.operators.Jsonl.write(df, out2)
    val two = graft.operators.Jsonl.read(spark, out2,
      StructType(Seq(StructField("doc_id", LongType), StructField("source", StringType))))
    assert(two.columns.toSeq == Seq("doc_id", "source") && two.count() == 5)
  }
}
