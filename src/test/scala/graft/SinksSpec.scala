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
}
