package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: assign documents to fixed
  * token-budget training sequences (greedy first-fit in id order, no
  * document splitting — the "no-crossdoc-split" packing used when
  * attention masking keeps packed docs independent).
  *
  * Packing is inherently SEQUENTIAL — the bin a document lands in depends
  * on every earlier document — so a naive distributed version is either a
  * driver loop (not distributed) or a single serial pass (not parallel).
  * The scalable design bounds the sequential unit instead: documents are
  * packed within SEGMENTS of `segSize` consecutive ids, independently and
  * in parallel. Cross-segment packing could save at most one partially
  * filled sequence per segment (bounded waste, measured in the `seq_fill`
  * output), while a global pass would serialize the whole corpus; at
  * 100 TB the segment key is the only shuffle and every segment's greedy
  * fold runs as one aggregate HOF over a bounded (≤ segSize) collected
  * array — never a driver loop, never an unbounded collect_list.
  *
  * Greedy rule, applied in ascending id order within a segment: a doc
  * joins the current sequence unless its tokens would overflow `budget`
  * AND the sequence is non-empty (an oversized doc therefore occupies a
  * sequence alone rather than looping forever). seq_id = seg * segSize +
  * bin is globally unique because a segment of segSize docs can open at
  * most segSize bins.
  */
object Packing {

  /** Per-document sequence assignment:
    * (idCol, seg, bin, seq_id, n_tokens, seq_fill, seq_docs).
    * `tokCol` must be an integer token count column.
    *
    * seq_fill/seq_docs are computed INSIDE the per-segment projection
    * (the whole segment is already in one array after the fold) — a
    * bounded segSize² array scan per segment instead of a second
    * corpus-wide shuffle on seq_id, which is the difference between one
    * exchange and two at 100 TB. */
  def packGreedy(df: DataFrame, idCol: String, tokCol: String,
                 budget: Int, segSize: Int): DataFrame = {
    val seg = df.select(col(idCol).cast("long").as("id"),
        col(tokCol).cast("int").as("tok"))
      .withColumn("seg", expr(s"id DIV $segSize"))
    seg.groupBy("seg")
      .agg(sort_array(collect_list(struct(col("id"), col("tok")))).as("items"))
      .withColumn("assigned", expr(
        s"""aggregate(items,
              named_struct(
                'out', CAST(array() AS ARRAY<STRUCT<id: BIGINT, tok: INT, bin: INT>>),
                'bin', 0, 'fill', 0),
              (acc, x) -> IF(acc.fill > 0 AND acc.fill + x.tok > $budget,
                named_struct(
                  'out', concat(acc.out, array(named_struct(
                    'id', x.id, 'tok', x.tok, 'bin', acc.bin + 1))),
                  'bin', acc.bin + 1, 'fill', x.tok),
                named_struct(
                  'out', concat(acc.out, array(named_struct(
                    'id', x.id, 'tok', x.tok, 'bin', acc.bin))),
                  'bin', acc.bin, 'fill', acc.fill + x.tok)),
              acc -> acc.out)"""))
      .withColumn("a", explode(expr(
        """transform(assigned, a -> named_struct(
             'id', a.id, 'tok', a.tok, 'bin', a.bin,
             'fill', aggregate(filter(assigned, y -> y.bin = a.bin),
                               0, (s, y) -> s + y.tok),
             'docs', size(filter(assigned, y -> y.bin = a.bin))))""")))
      .select(col("a.id").as(idCol), col("seg"),
        col("a.bin").as("bin"),
        (col("seg") * segSize + col("a.bin")).as("seq_id"),
        col("a.tok").as("n_tokens"),
        col("a.fill").as("seq_fill"),
        col("a.docs").cast("int").as("seq_docs"))
  }
}
