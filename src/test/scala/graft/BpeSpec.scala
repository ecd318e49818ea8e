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
    val viaExpr = TextAnalysis.subwordTokenCount(docs, "doc_id", "text", v)
      .select("doc_id", "bpe_tokens").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val direct = docs.collect()
      .map(r => r.getLong(0) -> k(r.getString(1), v)).toMap
    assert(viaExpr == direct, "expression diverges from the kernel")
    assert(viaExpr.values.sum > 0)
    // interpreted path agrees (codegen off)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = TextAnalysis.subwordTokenCount(docs, "doc_id", "text", v)
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

  // ------------------------------------------------------------------
  // merge-order BPE (round 15)

  private def m(text: String, merges: Seq[(String, String)]): Int = {
    val ranks = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      ranks.putIfAbsent(a + " " + b, Int.box(i))
    }
    graft.functions.BpeMergeKernel.count(UTF8String.fromString(text), ranks)
  }

  test("merge-order semantics, hand-pinned: lowest rank first, all disjoint occurrences per round") {
    val rules = TextAnalysis.demoBpeMerges
    // (t,h) then (th,e): 'the' -> 1
    assert(m("the", rules) == 1)
    // 'tion': (o,n) r5 beats (t,i) r8 -> [t,i,on]; then (t,i) -> [ti,on];
    // then (ti,on) -> [tion] = 1
    assert(m("tion", rules) == 1)
    // all disjoint occurrences merge in ONE round, left to right:
    // 'inin' with (i,n) -> [in, in] = 2
    assert(m("inin", Seq(("i", "n"))) == 2)
    // the odd-run case: 'aaa' with (a,a) -> [aa, a] = 2; 'aaaa' -> 2
    assert(m("aaa", Seq(("a", "a"))) == 2)
    assert(m("aaaa", Seq(("a", "a"))) == 2)
    // no rule present -> one token per codepoint
    assert(m("xyz", rules) == 3)
    // multi-word + empties
    assert(m("the tion", rules) == 2)
    assert(m("a  b", rules) == 2)
    assert(m("", rules) == 0)
  }

  test("greedy and merge-order PROVABLY differ on the pinned fixture words") {
    val rules = TextAnalysis.demoBpeMerges
    val vocab = rules.map { case (a, b) => a + b } // same piece inventory
    // 'ting': greedy commits to 'ti' first -> ti|n|g = 3; merge-order
    // builds (i,n) r1 before (t,i) r8, then (in,g) -> t|ing = 2
    assert(k("ting", vocab) == 3 && m("ting", rules) == 2)
    // 'testing': greedy t|es|ti|n|g = 5; merge t|es|t|ing = 4
    assert(k("testing", vocab) == 5 && m("testing", rules) == 4)
    // 'sorting': greedy s|or|ti|n|g = 5; merge s|or|t|ing = 4
    assert(k("sorting", vocab) == 5 && m("sorting", rules) == 4)
  }

  test("merge list hygiene: inconsistent tables refuse; duplicates keep first rank") {
    // 'ab' used as a side before any rule builds it
    intercept[IllegalArgumentException] {
      BpeExpression.bpeMergeCount(col("text"), Seq(("ab", "c")))
    }
    intercept[IllegalArgumentException] {
      BpeExpression.bpeMergeCount(col("text"), Seq(("a", "b c")))
    }
    intercept[IllegalArgumentException] {
      BpeExpression.bpeMergeCount(col("text"), Seq.empty)
    }
    // duplicated rule is harmless: first rank wins
    assert(m("ab", Seq(("a", "b"), ("a", "b"))) == 1)
  }

  test("merge expression (interpreted and codegen) == kernel over the documents fixture") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val rules = TextAnalysis.demoBpeMerges
    val viaExpr = TextAnalysis.mergeTokenCount(docs, "doc_id", "text", rules)
      .select("doc_id", "bpe_tokens").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val direct = docs.collect()
      .map(r => r.getLong(0) -> m(r.getString(1), rules)).toMap
    assert(viaExpr == direct, "merge expression diverges from the kernel")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = TextAnalysis.mergeTokenCount(docs, "doc_id", "text", rules)
        .select("doc_id", "bpe_tokens").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(interp == direct, "interpreted eval diverges from codegen")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("trainBpeMerges learns the hand-computable merges of a tiny corpus and the trained rules feed the encoder") {
    // corpus: 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3 — the
    // Sennrich et al. worked example family. Pair counts, round 1:
    // (e,s) 9, (s,t) 9, (w,e) 8, ... tie (e,s)/(s,t) breaks lexically:
    // 'e s' < 's t' -> (e,s) first, then (es,t) 9.
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val learned = TextAnalysis.trainBpeMerges(corpus, "text", numMerges = 4)
    assert(learned.take(2).map(t => (t._1, t._2)) == Seq(("e", "s"), ("es", "t")),
      s"first two merges diverge from the hand computation: $learned")
    assert(learned.head._3 == 9L && learned(1)._3 == 9L)
    // round 3: after est, counts: (l,o) 7, (o,w) 7, (w,e) 2... wait
    // (l,o) and (o,w) tie at 7 -> 'l o' < 'o w' -> (l,o)
    assert(learned(2) == ("l", "o", 7L), s"round-3 merge: ${learned(2)}")
    assert(learned(3) == ("lo", "w", 7L), s"round-4 merge: ${learned(3)}")
    // consistency: the trained list feeds the encoder directly
    val rules = learned.map(t => (t._1, t._2))
    // 'newest' under [es, est, lo, low]: n|e|w|est = 4
    assert(m("newest", rules) == 4)
    assert(m("low", rules) == 1)
    // early stop: a min frequency above every pair count learns nothing
    assert(TextAnalysis.trainBpeMerges(corpus, "text", 4, minFreq = 100L).isEmpty)
    // delimiter hygiene is loud
    intercept[IllegalArgumentException] {
      TextAnalysis.trainBpeMerges(Seq((1L, "a<b")).toDF("doc_id", "text"),
        "text", 2)
    }
  }

  test("byte-level pretok kernel: contractions, punctuation, space pieces, byte fallback — hand-pinned") {
    import graft.functions.BpeBytePretokKernel
    def cnt(text: String, merges: Seq[(String, String)]): Int = {
      val df = Seq((1L, text)).toDF("doc_id", "text")
      TextAnalysis.byteMergeTokenCount(df, "doc_id", "text", merges, "n")
        .head().getAs[Int]("n")
    }
    // space bytes COUNT at byte level: "a b" -> [a][ ][b] without a
    // space rule, [a][ b] with one
    assert(cnt("a b", Seq(("x", "y"))) == 3)
    assert(cnt("a b", Seq((" ", "b"))) == 2)
    // contraction boundary: whitespace-split can merge across n-'
    // inside "don't"; the pretokenizer splits [don]['t] first
    val rule = Seq(("n", "'"))
    val dfD = Seq((1L, "don't")).toDF("doc_id", "text")
    val wsCount = TextAnalysis.mergeTokenCount(dfD, "doc_id", "text", rule, "n")
      .head().getAs[Int]("n")
    assert(wsCount == 4, s"whitespace path merges n-': $wsCount") // d o n' t
    assert(cnt("don't", rule) == 5, "pretokenizer forbids the cross-boundary merge") // d o n | ' t
    // punctuation runs become their own pretokens
    assert(cnt("word,", Seq(("w", "o"))) == 4) // wo r d | ,
    // byte fallback: é is two UTF-8 bytes (0xC3 0xA9); a byte rule
    // merges them back to one token
    assert(cnt("é", Seq(("x", "y"))) == 2)
    assert(cnt("é", Seq(("Ã", "©"))) == 1)
    // ASCII single-pretoken equivalence with the whitespace kernel
    val dfT = Seq((1L, "testing")).toDF("doc_id", "text")
    val a = TextAnalysis.mergeTokenCount(dfT, "doc_id", "text",
      TextAnalysis.demoBpeMerges, "n").head().getAs[Int]("n")
    assert(cnt("testing", TextAnalysis.demoBpeMerges) == a)
    // raw kernel agrees with the expression (codegen path exercised by
    // the DataFrame call above; interpreted here)
    val ranksDemo = new java.util.HashMap[String, Integer]()
    TextAnalysis.demoByteMerges.zipWithIndex.foreach { case ((x, y), i) =>
      ranksDemo.putIfAbsent(x + "\u0001" + y, i)
    }
    assert(BpeBytePretokKernel.count(UTF8String.fromString("the cat"), ranksDemo) ==
      cnt("the cat", TextAnalysis.demoByteMerges))
    // inconsistent byte rule list refuses
    intercept[IllegalArgumentException] {
      cnt("x", Seq(("ab", "c")))
    }
  }

  test("byte-level trainer learns space-prefixed pieces; whitespace trainer cannot") {
    val corpus = Seq.fill(6)((1L, "the cat and the bat and the rat"))
      .zipWithIndex.map { case ((_, t), i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val byteRules = TextAnalysis.trainBpeMerges(corpus, "text",
      numMerges = 6, minFreq = 2L, byteLevel = true)
    assert(byteRules.nonEmpty)
    // space-side rules exist at byte level (" t" family appears in
    // " the" x2 per doc + " rat"/" bat" tails)
    assert(byteRules.exists { case (a, b, _) => (a + b).contains(" ") },
      s"no space-prefixed piece learned: $byteRules")
    // the learned rules feed the counting kernel directly
    val counted = TextAnalysis.byteMergeTokenCount(corpus, "doc_id", "text",
      byteRules.map(r => (r._1, r._2)), "n").select("n").head().getInt(0)
    assert(counted > 0)
    // whitespace trainer on the same corpus never learns a space side
    val wsRules = TextAnalysis.trainBpeMerges(corpus, "text",
      numMerges = 6, minFreq = 2L)
    assert(wsRules.forall { case (a, b, _) => !(a + b).contains(" ") })
  }
}
