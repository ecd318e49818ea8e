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

/** MERGE-ORDER byte-pair encoding (round 15) — the GPT-2/tiktoken
  * family's semantics, vs [[BpeKernel]]'s greedy longest-match
  * (WordPiece/SentencePiece serving). A merge-LIST tokenizer does not
  * probe a vocabulary: it starts each word as single codepoints and
  * repeatedly applies the LOWEST-RANKED merge rule present among the
  * word's adjacent symbol pairs — merging every disjoint occurrence of
  * that pair left-to-right — until no adjacent pair is a rule. The two
  * countings provably differ (a low-rank merge can cross a boundary a
  * greedy longest-match already committed to: with vocab {ti, in, ing}
  * greedy takes "ti" first in "ting" → 3 tokens, while merge-order
  * builds (i,n) then (in,g) → [t, ing] = 2), so a deployment budgeting
  * in "tokenizer units" must pick the semantics its real tokenizer
  * uses — q131 pins a fixture where they disagree, both DuckDB-oracled.
  *
  * Each round merges all DISJOINT occurrences of the chosen pair in
  * one left-to-right sweep (exactly GPT-2 encoder.py's inner loop), so
  * a word of n codepoints settles in at most n−1 rounds — the bound
  * the unrolled DuckDB replay leans on (q131: per-round "first pattern
  * present wins" nested CASE over the rank-ordered rules, applied to a
  * delimiter-wrapped symbol string where `replace` is exactly the
  * disjoint left-to-right sweep).
  */
object BpeMergeKernel extends Serializable {

  /** Total merge-order tokens across all space-separated words.
    * `ranks` maps "left right" (single-space-joined — pieces contain
    * no spaces) to the rule's rank; lower rank wins each round. */
  def count(text: UTF8String, ranks: java.util.HashMap[String, Integer]): Int = {
    if (text == null) return 0
    val s = text.toString
    var total = 0
    var ws = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        total += countWord(s, ws, i, ranks)
        ws = i + 1
      }
      i += 1
    }
    total
  }

  private def countWord(s: String, from: Int, until: Int,
                        ranks: java.util.HashMap[String, Integer]): Int = {
    if (from >= until) return 0
    // initial symbols: one per codepoint
    var syms = new java.util.ArrayList[String]()
    var p = from
    while (p < until) {
      val c = Character.charCount(s.codePointAt(p))
      syms.add(s.substring(p, p + c))
      p += c
    }
    var done = false
    while (!done && syms.size > 1) {
      // lowest-ranked rule present among adjacent pairs
      var best: String = null
      var bestRank = Integer.MAX_VALUE
      var i = 0
      while (i < syms.size - 1) {
        val r = ranks.get(syms.get(i) + " " + syms.get(i + 1))
        if (r != null && r < bestRank) { bestRank = r; best = syms.get(i) + " " + syms.get(i + 1) }
        i += 1
      }
      if (best == null) done = true
      else {
        val sp = best.indexOf(' ')
        val a = best.substring(0, sp)
        val b = best.substring(sp + 1)
        // one left-to-right sweep merging every disjoint occurrence
        val next = new java.util.ArrayList[String](syms.size)
        var j = 0
        while (j < syms.size) {
          if (j < syms.size - 1 && syms.get(j) == a && syms.get(j + 1) == b) {
            next.add(a + b); j += 2
          } else { next.add(syms.get(j)); j += 1 }
        }
        syms = next
      }
    }
    syms.size
  }
}

/** `graft_bpe_merge_count(text)`: total merge-order BPE tokens of a
  * document under a frozen rank-ordered merge list — see
  * [[BpeMergeKernel]]. The rank map rides into generated code as one
  * referenced HashMap per task (the [[BpeCount]] discipline), so a
  * 50k-rule GPT-2-style merge table costs plan size O(1). */
case class BpeMergeCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  require(merges.nonEmpty, "BPE merge list must not be empty")
  require(merges.forall { case (a, b) =>
    a.nonEmpty && b.nonEmpty && !a.contains(" ") && !b.contains(" ") },
    "BPE merge sides must be non-empty and contain no spaces " +
      "(the pre-tokenizer splits on single spaces)")
  // a trained merge table is CONSISTENT: every rule's sides are single
  // codepoints or outputs of earlier rules — which is what guarantees
  // pairs involving a merged symbol rank strictly after the rule that
  // built it. Enforced here to catch hand-built lists that could never
  // come out of a trainer.
  require({
    val built = scala.collection.mutable.Set[String]()
    merges.forall { case (a, b) =>
      val ok = (a.codePointCount(0, a.length) == 1 || built.contains(a)) &&
        (b.codePointCount(0, b.length) == 1 || built.contains(b))
      built += (a + b)
      ok
    }
  }, "BPE merge list is inconsistent: every rule's sides must be single " +
    "codepoints or the output of an EARLIER rule (trained merge tables " +
    "satisfy this by construction)")

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val h = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      // first occurrence wins: a duplicated rule can never fire at its
      // later rank (the pair is gone or re-formed identically)
      h.putIfAbsent(a + " " + b, i)
    }
    h
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bpe_merge_count needs a string column, got $other")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bpe_merge_count"

  override def nullSafeEval(input: Any): Any =
    BpeMergeKernel.count(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeMerges", ranks,
      "java.util.HashMap<String,Integer>")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.BpeMergeKernel.count($t, $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeCount =
    copy(child = newChild)
}

/** BYTE-LEVEL merge-order BPE with the GPT-2 pre-tokenizer (round 16)
  * — what [[BpeMergeKernel]] counts after the two fidelity steps that
  * make counts match tiktoken-class tokenizers:
  *
  *   1. PRE-TOKENIZATION: the GPT-2 regex — contractions first, then
  *      optional-leading-space letter/digit/punctuation runs, then
  *      whitespace runs — instead of a plain whitespace split, so
  *      "don't" counts as [don]['t], "word," as [word][,], and a
  *      mid-text word carries its leading space into the token (the
  *      " the"-style pieces every GPT-2-family vocabulary is full of).
  *      This engine's pattern drops GPT-2's one lookahead branch
  *      (`\s+(?!\S)`), keeping the pattern RE2-expressible so the
  *      DuckDB oracle runs it verbatim: on a k-space run before a
  *      word, GPT-2 emits (k−1 spaces)+( word) where this emits
  *      (k spaces)+(word) — the PRETOKEN COUNT is identical, the
  *      boundary shifts by one space only on multi-space runs (which
  *      single-space corpora never contain). Alternation is
  *      leftmost-FIRST in both java.util.regex and RE2, so both
  *      engines segment identically.
  *   2. BYTE FALLBACK: each pretoken starts as one symbol per UTF-8
  *      BYTE (rendered as the byte's latin-1 codepoint, so rule tables
  *      are plain strings), not per codepoint — "café" is 5 initial
  *      symbols and a non-ASCII char can never fall outside the
  *      alphabet, exactly the GPT-2 byte-level contract.
  *
  * Merge rounds are [[BpeMergeKernel]]'s verbatim (lowest-ranked rule
  * present, one disjoint left-to-right sweep per round); rule keys are
  * \u0001-joined because byte symbols may legitimately contain
  * spaces. */
object BpeBytePretokKernel extends Serializable {

  /** The RE2-safe GPT-2 pre-tokenizer pattern (see class doc). */
  val PretokPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  private val pretok = java.util.regex.Pattern.compile(PretokPattern)

  /** Total byte-level merge-order tokens across all pretokens. */
  def count(text: UTF8String, ranks: java.util.HashMap[String, Integer]): Int = {
    if (text == null) return 0
    val s = text.toString
    val m = pretok.matcher(s)
    var total = 0
    while (m.find()) total += countPretoken(s, m.start(), m.end(), ranks)
    total
  }

  private def countPretoken(s: String, from: Int, until: Int,
                            ranks: java.util.HashMap[String, Integer]): Int = {
    val bytes = s.substring(from, until)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (bytes.length == 0) return 0
    var syms = new java.util.ArrayList[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      syms.add(String.valueOf((bytes(i) & 0xFF).toChar))
      i += 1
    }
    var done = false
    while (!done && syms.size > 1) {
      var best: Int = -1
      var bestRank = Integer.MAX_VALUE
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(syms.get(j) + "\u0001" + syms.get(j + 1))
        if (r != null && r < bestRank) { bestRank = r; best = j }
        j += 1
      }
      if (best < 0) done = true
      else {
        val a = syms.get(best)
        val b = syms.get(best + 1)
        val next = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1 && syms.get(k) == a && syms.get(k + 1) == b) {
            next.add(a + b); k += 2
          } else { next.add(syms.get(k)); k += 1 }
        }
        syms = next
      }
    }
    syms.size
  }
}

/** `graft_bpe_byte_count(text)`: total byte-level merge-order BPE
  * tokens under the GPT-2 pre-tokenizer — see [[BpeBytePretokKernel]].
  * Rule-table discipline identical to [[BpeMergeCount]] (one
  * referenced HashMap per task, plan size O(1)); sides MAY contain
  * spaces (a space is byte 0x20 — the " the" pieces), so keys join on
  * \u0001 and the consistency check requires sides to be single BYTES
  * (one latin-1-range char) or earlier rule outputs. */
case class BpeBytePretokCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  require(merges.nonEmpty, "BPE merge list must not be empty")
  require(merges.forall { case (a, b) =>
    a.nonEmpty && b.nonEmpty && !a.contains("\u0001") && !b.contains("\u0001") },
    "byte-level BPE merge sides must be non-empty and contain no \\u0001 " +
      "(the rule-key separator)")
  require({
    val built = scala.collection.mutable.Set[String]()
    merges.forall { case (a, b) =>
      def isByte(x: String) = x.length == 1 && x.charAt(0) <= 0xFF
      val ok = (isByte(a) || built.contains(a)) && (isByte(b) || built.contains(b))
      built += (a + b)
      ok
    }
  }, "byte-level BPE merge list is inconsistent: every rule's sides must " +
    "be single bytes (latin-1-range chars) or the output of an EARLIER " +
    "rule (byte-level trained merge tables satisfy this by construction)")

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val h = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      h.putIfAbsent(a + "\u0001" + b, i)
    }
    h
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bpe_byte_count needs a string column, got $other")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bpe_byte_count"

  override def nullSafeEval(input: Any): Any =
    BpeBytePretokKernel.count(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeByteMerges", ranks,
      "java.util.HashMap<String,Integer>")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.BpeBytePretokKernel.count($t, $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeBytePretokCount =
    copy(child = newChild)
}

object BpeExpression {
  /** Greedy frozen-vocab subword token count of a text column. */
  def bpeCount(text: Column, vocab: Seq[String]): Column =
    Bridge.column(BpeCount(Bridge.expression(text), vocab))

  /** Merge-order BPE token count of a text column under a frozen
    * rank-ordered merge list. */
  def bpeMergeCount(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeMergeCount(Bridge.expression(text), merges))

  /** Byte-level merge-order BPE token count with the GPT-2
    * pre-tokenizer (contractions / space-prefixed runs / byte
    * fallback). */
  def bpeBytePretokCount(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeBytePretokCount(Bridge.expression(text), merges))
}
