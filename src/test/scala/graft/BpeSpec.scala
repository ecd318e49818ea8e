package graft

import graft.functions.{BpeExpression, BpeKernel}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Frozen-vocab greedy subword token counting: hand-pinned greedy
  * longest-match semantics, whitespace/empty-word edges, Unicode
  * codepoint stepping, and interpreted-vs-codegen parity of the native
  * expression over the real documents fixture.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = Tables.session(4)
  import spark.implicits._

  private def k(text: String, vocab: Seq[String]): Int = {
    val set = new java.util.HashSet[String]()
    vocab.foreach(set.add)
    BpeKernel.count(UTF8String.fromString(text),
      set, vocab.map(p => p.codePointCount(0, p.length)).max)
  }

  test("greedy longest-match semantics, hand-pinned") {
    val v = TextAnalysis.demoBpeVocab
    // 'the' matches whole -> 1
    assert(k("the", v) == 1)
    // 'theory': the|or|y -> 3 (longest at each position, no backtrack)
    assert(k("theory", v) == 3)
    // 'tion' (len 4) matches whole -> 1
    assert(k("tion", v) == 1)
    // unknown chars fall back to one token per codepoint
    assert(k("xyz", v) == 3)
    // greedy is NOT optimal: 'xthe' -> x|the = 2; 'thex' -> the|x = 2
    assert(k("xthe", v) == 2 && k("thex", v) == 2)
    // multi-word sums; empty words (double space) count zero
    assert(k("the theory", v) == 1 + 3)
    assert(k("a  b", v) == 2)
    assert(k("", v) == 0)
    assert(k(" ", v) == 0)
  }

  test("codepoint stepping: astral chars consume one token, not two") {
    val v = Seq("ab")
    // U+1F600 is a surrogate pair in UTF-16; must count as ONE fallback
    val emoji = new String(Character.toChars(0x1F600))
    assert(k(s"${emoji}ab", v) == 2)
    assert(k(emoji * 3, v) == 3)
    // a vocab piece containing an astral char matches by codepoints
    val v2 = Seq(emoji + "a")
    assert(k(emoji + "a", v2) == 1)
  }

  test("expression (interpreted and codegen) == kernel over the documents fixture") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val v = TextAnalysis.demoBpeVocab
    val viaExpr = TextAnalysis.bpeTokenCount(docs, "doc_id", "text", v)
      .select("doc_id", "bpe_tokens").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val direct = docs.collect()
      .map(r => r.getLong(0) -> k(r.getString(1), v)).toMap
    assert(viaExpr == direct, "expression diverges from the kernel")
    assert(viaExpr.values.sum > 0)
    // interpreted path agrees (codegen off)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = TextAnalysis.bpeTokenCount(docs, "doc_id", "text", v)
        .select("doc_id", "bpe_tokens").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(interp == direct, "interpreted eval diverges from codegen")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // BPE counts differ from whitespace counts (they measure subwords)
    val ws = docs.select(sum(size(split(col("text"), " ")))).head().getLong(0)
    assert(viaExpr.values.map(_.toLong).sum > ws,
      "subword counts should exceed whitespace counts on English text")
  }

  test("vocabulary hygiene is enforced") {
    intercept[IllegalArgumentException] {
      BpeExpression.bpeCount(col("text"), Seq("a b"))
    }
    intercept[IllegalArgumentException] {
      BpeExpression.bpeCount(col("text"), Seq(""))
    }
    intercept[IllegalArgumentException] {
      BpeExpression.bpeCount(col("text"), Seq.empty)
    }
  }
}
