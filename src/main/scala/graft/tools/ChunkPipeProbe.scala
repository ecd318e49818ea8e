package graft.tools

import graft.Tables
import graft.operators.{Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Dev probe (round 11): stage-by-stage wall breakdown of the q117
  * chunk → embed → pool → SemDeDup composition, to see which leg pays
  * at bench scale. Usage: runMain graft.tools.ChunkPipeProbe <sfDir>
  */
object ChunkPipeProbe {
  def main(args: Array[String]): Unit = {
    val d = args.head
    val spark = Tables.session(32)
    spark.sparkContext.setLogLevel("WARN")
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[cpp] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = Tables(spark, d, "documents").select(col("doc_id"), col("text"))
    val corpus = base.union(base.select(
      (col("doc_id") + 10000000L).as("doc_id"), col("text")))
    val chunks = TextAnalysis.chunkTokens(corpus, "doc_id", "text",
        window = 32, overlap = 8)
      .withColumn("chunk_id", col("doc_id") * 100000L + col("chunk_idx"))
    val nChunks = t("chunks.count")(chunks.count())
    println(s"[cpp] n_chunks=$nChunks")
    val emb = Multimodal.decodeFeatures(
      Multimodal.binarize(chunks, "chunk_id", "chunk_text"),
      "chunk_id", "bytes")
    t("decode.count")(emb.count())
    val pooledRaw = Similarity.meanPoolNormalize(
        emb.withColumn("doc_id", expr("chunk_id div 100000L")),
        "doc_id", "features")
      .select(col("doc_id"), col("pooled"))
    val meanRow = pooledRaw.agg(org.apache.spark.ml.stat.Summarizer
        .mean(org.apache.spark.ml.functions.array_to_vector(col("pooled")))
        .as("__mv"))
      .select(org.apache.spark.ml.functions.vector_to_array(col("__mv"))
        .as("__mean"))
    val pooled = t("pool+center+ckpt")(pooledRaw.crossJoin(broadcast(meanRow))
      .select(col("doc_id"),
        zip_with(col("pooled"), col("__mean"), (a, b) => a - b).as("unit"))
      .localCheckpoint(true))
    val out = t("semdedup+ckpt")(Similarity.semanticDedup(pooled, "doc_id", "unit",
      threshold = 0.999).localCheckpoint(true))
    val kept = out.filter(col("kept"))
    println(s"[cpp] docs=${out.count()} kept=${kept.count()}")
    t("bothKept")(kept.filter(col("doc_id") < 10000000L)
      .select((col("doc_id") + 10000000L).as("doc_id"))
      .join(kept, Seq("doc_id"), "left_semi").count())
    t("witness")(out.filter(!col("kept"))
      .join(kept.select(col("doc_id").as("canonical"), col("cell").as("__kc")),
        Seq("canonical"), "left")
      .filter(col("__kc").isNull || col("__kc") =!= col("cell")).count())
    val keptVec = kept.join(pooled, Seq("doc_id"))
      .withColumn("__n", sqrt(Similarity.dot(col("unit"), col("unit"))))
    val ka = keptVec.select(col("cell"), col("doc_id").as("a_id"),
      col("unit").as("av"), col("__n").as("an"))
    val kb = keptVec.select(col("cell"), col("doc_id").as("b_id"),
      col("unit").as("bv"), col("__n").as("bn"))
    t("keptEdges")(ka.join(kb, Seq("cell")).filter(col("a_id") < col("b_id"))
      .filter(round(Similarity.dot(col("av"), col("bv")) /
        (col("an") * col("bn")), 6) >= 0.999).count())
    spark.stop()
  }
}
