package graft.tools

import graft.Tables
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Dev probe: frozen-vocab subword counting at representative vocab and
  * corpus cardinalities (the BloomProbe discipline — catalog rows run
  * the 45-piece demo vocab over 500-doc fixtures; the claims that need
  * sized evidence are "a 50k-piece PRODUCTION vocab costs no more per
  * row than the demo one" (HashSet probes, vocab rides as one
  * referenced object) and "the greedy kernel is linear in corpus
  * size").
  *
  * Usage: runMain graft.tools.BpeProbe <sfDir> [sfDir2 ...]
  *
  * Per dir: docs/s and tokens with (a) the demo vocab and (b) a
  * synthetic 50 000-piece vocab (2-4-char combinations, deterministic —
  * matches MORE, so its token totals are lower; what must NOT move is
  * the throughput). A whitespace `size(split())` pass anchors the
  * baseline cost of just reading + splitting.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session(32)
    // 50k deterministic pieces: all 2-grams and 3-grams over a 26+10
    // alphabet until the budget fills (26^3 = 17576 3-grams + 1296
    // 2-grams + 4-grams to fill)
    val alpha = ('a' to 'z') ++ ('0' to '9')
    val two = for (a <- alpha; b <- alpha) yield s"$a$b"
    val three = for (a <- 'a' to 'z'; b <- 'a' to 'z'; c <- 'a' to 'z') yield s"$a$b$c"
    val four = for (a <- 'a' to 'z'; b <- 'a' to 'z'; c <- 'a' to 'z')
      yield s"$a$b${c}e"
    val big = (two ++ three ++ four).take(50000)
    println(s"[bpe] synthetic vocab pieces=${big.size} maxLen=${big.map(_.length).max}")

    args.foreach { dir =>
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text")).localCheckpoint(true)
      val n = docs.count()
      def time(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val v = f
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[bpe] $dir $label: $s%.2f s (${n / s}%.0f docs/s, total=$v)")
      }
      time("whitespace ") {
        docs.agg(sum(size(split(col("text"), " ")))).head().getLong(0)
      }
      time("demo vocab ") {
        TextAnalysis.subwordTokenCount(docs, "doc_id", "text")
          .agg(sum("bpe_tokens")).head().getLong(0)
      }
      time("50k vocab  ") {
        TextAnalysis.subwordTokenCount(docs, "doc_id", "text", vocab = big)
          .agg(sum("bpe_tokens")).head().getLong(0)
      }
      // merge-order kernel (round 15): same claims as greedy — rule
      // table rides as one referenced HashMap, throughput must not
      // move between the 16-rule demo list and a synthetic 50k-rule
      // table (chained single-char merges: a+b, ab+c, abc+d — every
      // rule consistent, realistic rank-probe density)
      time("demo merges") {
        TextAnalysis.mergeTokenCount(docs, "doc_id", "text")
          .agg(sum("bpe_tokens")).head().getLong(0)
      }
      val bigMerges = {
        val ms = scala.collection.mutable.ArrayBuffer[(String, String)]()
        for (a <- 'a' to 'z'; b <- 'a' to 'z' if ms.size < 50000) {
          var cur = a.toString
          ms += ((cur, b.toString)) // seed: a+b
          cur = cur + b
          var j = 0
          while (j < 72 && ms.size < 50000) { // chain: cur + letter
            val c = ('a' + (j % 26)).toChar.toString
            ms += ((cur, c))
            cur = cur + c
            j += 1
          }
        }
        ms.toSeq
      }
      time("50k merges ") {
        TextAnalysis.mergeTokenCount(docs, "doc_id", "text", bigMerges)
          .agg(sum("bpe_tokens")).head().getLong(0)
      }
      // byte-level pretok kernel (round 16): regex pretokenization +
      // per-byte symbols add constant per-row work — throughput must
      // stay in the merge-kernel band with both rule-table sizes
      time("demo bytes ") {
        TextAnalysis.byteMergeTokenCount(docs, "doc_id", "text")
          .agg(sum("bpe_tokens")).head().getLong(0)
      }
      time("50k bytes  ") {
        TextAnalysis.byteMergeTokenCount(docs, "doc_id", "text", bigMerges)
          .agg(sum("bpe_tokens")).head().getLong(0)
      }
      // trainer rung: 8 learned merges — per-round cost is O(word
      // TYPES), so wall time must stay nearly flat as the corpus
      // grows (the type table of the clone fixtures barely grows)
      val t0 = System.nanoTime()
      val learned = TextAnalysis.trainBpeMerges(docs, "text", numMerges = 8)
      println(f"[bpe] $dir train 8 merges: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"(learned=${learned.map(m => m._1 + "+" + m._2).mkString(",")})")
      // byte-level trainer rung: same O(types)-per-round claim with the
      // regex pretokenizer + byte wrap in pass 1
      val t1 = System.nanoTime()
      val learnedB = TextAnalysis.trainBpeMerges(docs, "text", numMerges = 8,
        byteLevel = true)
      println(f"[bpe] $dir train 8 byte merges: ${(System.nanoTime() - t1) / 1e9}%.2f s " +
        s"(learned=${learnedB.map(m => "[" + m._1 + "+" + m._2 + "]").mkString(",")})")
    }
    spark.stop()
  }
}
