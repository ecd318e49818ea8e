package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Frozen-vocabulary subword token counting — the unit real training
  * mixtures budget in. Whitespace token counts under-count code and CJK
  * by multiples; a byte-pair-style encoder with a FROZEN vocabulary
  * (the deployment ships its tokenizer's piece list) counts the units
  * the training run will actually see.
  *
  * Algorithm (deterministic, engine-replayable — the q91 discipline):
  * split the text on single spaces (empties kept, zero tokens each);
  * per word, GREEDY LONGEST-MATCH over Unicode codepoints against the
  * vocabulary: at position p take the longest piece (maxPieceLen ≥ l ≥
  * 2) whose codepoints equal the word's at p, else consume one
  * codepoint as one token (the byte-fallback every real BPE vocab
  * closes with). Greedy longest-match is the WordPiece/SentencePiece
  * serving-side formulation; it visits each position once, so a doc
  * costs O(len · maxPieceLen) hash probes with no shuffle and no UDF —
  * one codegen'd kernel call per row.
  *
  * The DuckDB oracle replays the same function without recursion via
  * pointer doubling over the per-position jump table (next(p) = p +
  * l(p) computed in parallel for every p, composed in log2 rounds —
  * the q116/q119 bounded-unroll discipline), so both engines agree
  * bit-for-bit; see the q128 catalog row.
  */
object BpeKernel extends Serializable {

  /** Total greedy-subword tokens across all space-separated words. */
  def count(text: UTF8String, vocab: java.util.HashSet[String], maxPiece: Int): Int = {
    if (text == null) return 0
    val s = text.toString
    var total = 0
    var ws = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        total += countWord(s, ws, i, vocab, maxPiece)
        ws = i + 1
      }
      i += 1
    }
    total
  }

  /** Greedy tokens of the codepoint run s[from, until). */
  private def countWord(s: String, from: Int, until: Int,
                        vocab: java.util.HashSet[String], maxPiece: Int): Int = {
    var cnt = 0
    var p = from
    while (p < until) {
      var l = maxPiece
      var matchedEnd = 0
      while (l >= 2 && matchedEnd == 0) {
        val end = endOfCodepoints(s, p, until, l)
        if (end > 0 && vocab.contains(s.substring(p, end))) matchedEnd = end
        l -= 1
      }
      p =
        if (matchedEnd > 0) matchedEnd
        else p + Character.charCount(s.codePointAt(p))
      cnt += 1
    }
    cnt
  }

  /** Char index after advancing `l` codepoints from `p`, or 0 if fewer
    * than `l` codepoints remain before `until`. Codepoint-based so the
    * count matches DuckDB/Spark `substring` semantics exactly. */
  private def endOfCodepoints(s: String, p: Int, until: Int, l: Int): Int = {
    var i = p
    var k = 0
    while (k < l && i < until) {
      i += Character.charCount(s.codePointAt(i))
      k += 1
    }
    if (k == l && i <= until) i else 0
  }
}

/** `graft_bpe_count(text)`: total frozen-vocab greedy subword tokens of
  * a document — see [[BpeKernel]]. The vocabulary is a per-plan
  * constant (typically thousands to ~100k pieces); it rides into the
  * generated code as one referenced HashSet object per task, NOT as a
  * literal expression tree, so plan size and per-row cost stay flat no
  * matter the vocab size.
  */
case class BpeCount(child: Expression, vocab: Seq[String]) extends UnaryExpression {
  require(vocab.nonEmpty, "BPE vocabulary must not be empty")
  require(vocab.forall(p => p.nonEmpty && !p.contains(" ")),
    "BPE vocabulary pieces must be non-empty and contain no spaces " +
      "(the pre-tokenizer splits on single spaces)")

  @transient private lazy val set: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(h.add)
    h
  }
  private val maxPiece: Int = vocab.map(p => p.codePointCount(0, p.length)).max

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bpe_count needs a string column, got $other")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bpe_count"

  override def nullSafeEval(input: Any): Any =
    BpeKernel.count(input.asInstanceOf[UTF8String], set, maxPiece)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("bpeVocab", set, "java.util.HashSet<String>")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.BpeKernel.count($t, $setRef, $maxPiece);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

object BpeExpression {
  /** Greedy frozen-vocab subword token count of a text column. */
  def bpeCount(text: Column, vocab: Seq[String]): Column =
    Bridge.column(BpeCount(Bridge.expression(text), vocab))
}
