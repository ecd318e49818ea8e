package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Local oracle-logic check: run each query's oracle SQL in SPARK (after
  * a minimal dialect rewrite) against the same tables and diff it with
  * the query output. Real DuckDB IS also available to driver-side python
  * (see the verify skill / BASELINE.md's four-scale sweeps) and catches
  * genuine dialect/codegen divergence this replay can't; this tool stays
  * useful as the fast in-JVM check for oracle LOGIC bugs — wrong
  * enumeration, wrong formula, wrong ordering — without leaving sbt.
  *
  * Dialect rewrites are intentionally dumb textual substitutions, so only
  * queries whose oracles stay in the shared subset are checkable; list-
  * function-heavy oracles are skipped (or overridden per query below).
  *
  * epoch_ns(ts) is emulated two ways — full nanos and micros-truncated
  * (`(ts div 1000) * 1000`) — because DuckDB's TIMESTAMP(NANOS) read may
  * or may not truncate; queries must hash-match under BOTH.
  */
object OracleEmu {

  /** DuckDB dialect shims as Spark SQL temp functions — GENERIC emulator
    * machinery (the principled way to shrink the per-query override
    * surface, round 9): functions whose arguments nest arbitrarily
    * (list_sum over a transform, sha256 of a substring) cannot be mapped
    * by a textual regex, but a SQL scalar function resolves them at the
    * analyzer, argument nesting and implicit numeric-array coercion
    * included. */
  private[tools] def installShims(spark: org.apache.spark.sql.SparkSession): Unit = Seq(
    "CREATE OR REPLACE TEMPORARY FUNCTION list_sum(a ARRAY<DOUBLE>) RETURNS DOUBLE " +
      "RETURN aggregate(a, CAST(0 AS DOUBLE), (x, y) -> x + y)",
    "CREATE OR REPLACE TEMPORARY FUNCTION list_max(a ARRAY<DOUBLE>) RETURNS DOUBLE " +
      "RETURN array_max(a)",
    "CREATE OR REPLACE TEMPORARY FUNCTION list_min(a ARRAY<DOUBLE>) RETURNS DOUBLE " +
      "RETURN array_min(a)",
    "CREATE OR REPLACE TEMPORARY FUNCTION sha256(s STRING) RETURNS STRING " +
      "RETURN sha2(CAST(s AS BINARY), 256)",
    // DuckDB range(a, b) is end-EXCLUSIVE; Spark sequence is inclusive.
    // Named duck_range (the rewriter maps `range(` onto it) because the
    // builtin range TVF blocks a SQL UDF of the same name.
    "CREATE OR REPLACE TEMPORARY FUNCTION duck_range(a BIGINT, b BIGINT) " +
      "RETURNS ARRAY<BIGINT> RETURN sequence(a, b - 1)",
    // DuckDB epoch(DATE) = seconds since the epoch at midnight UTC
    "CREATE OR REPLACE TEMPORARY FUNCTION epoch(d DATE) RETURNS BIGINT " +
      "RETURN unix_date(d) * CAST(86400 AS BIGINT)"
  ).foreach(spark.sql(_))

  private def rewrite(sql: String, epochNs: String): String = {
    var s = sql
    s = s.replace("//", " div ")
    s = s.replaceAll("""epoch_ns\(ts\)""", epochNs)
    s = s.replace("strpos(", "instr(")
    s = s.replaceAll("""quantile_cont\(""", "percentile(")
    // list/string function family
    s = s.replace("string_split(", "split(")
    s = s.replace("list_distinct(", "array_distinct(")
    s = s.replace("list_filter(", "filter(")
    s = s.replace("list_transform(", "transform(")
    s = s.replace("list_contains(", "array_contains(")
    s = s.replace("list_extract(", "element_at(") // same 1-based semantics
    // PREFIX slices only: DuckDB list_slice(l, 1, n) (inclusive end) ==
    // Spark slice(l, 1, n) (length) exactly when begin is 1 — oracles
    // must not use a non-1 begin with this textual mapping
    s = s.replace("list_slice(", "slice(")
    s = s.replace("array_to_string(", "array_join(")
    s = s.replace("unnest(", "explode(")
    s = s.replaceAll("""\blen\(""", "size(")
    s = s.replace("strftime(", "date_format(")
    s = s.replace("'%Y-%m-%d'", "'yyyy-MM-dd'")
    // prefix list slices expr(...)[1:n] -> slice(expr, 1, n) (one paren
    // level of nesting; must run before the element-index rewrite)
    s = s.replaceAll("""(\w+\([^()]*\))\[1:(\d+)\]""", "slice($1, 1, $2)")
    // 1-based element indexing name[2] / s[i] / s[i+1] -> element_at
    // (before the list-literal rewrite so [2] isn't turned into array(2));
    // colon excluded so slice syntax never matches here
    s = s.replaceAll("""([A-Za-z_][A-Za-z0-9_.]*)\[([A-Za-z0-9_+\- ]+)\]""",
      "element_at($1, $2)")
    // numeric list literals [0.0, 0.25] -> array(0.0, 0.25)
    s = s.replaceAll("""\[([0-9][0-9eE+\-., ]*)\]""", "array($1)")
    // regex flags arg (Spark regexp_replace is global by default)
    s = s.replace(", 'g')", ")")
    // DuckDB xor(a, b) -> Spark bitwise ^ (simple args only)
    s = s.replaceAll("""\bxor\(([^,()]+),\s*([^()]+)\)""", "($1 ^ $2)")
    // binary helper (sha256/list_sum/list_max/range/epoch resolve via
    // the installShims SQL functions — nesting-proof, no regex)
    s = s.replaceAll("""encode\(([^()]*)\)""", "CAST($1 AS BINARY)")
    // q99-family: the reference CSV read maps to the emulator's
    // explicit-schema carprice_raw view
    s = s.replaceAll("""read_csv\('[^']*'[^)]*\)""", "carprice_raw")
    // dot product: CAST-wrapped args first (one paren level), then the
    // plain-column form (oracle args are otherwise plain refs)
    s = s.replaceAll(
      """list_dot_product\((CAST\([^()]+\)),\s*(CAST\([^()]+\))\)""",
      "aggregate(zip_with($1, $2, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    s = s.replaceAll("""list_dot_product\(([^,()]+), ([^()]+)\)""",
      "aggregate(zip_with($1, $2, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    // range(a, b) is end-exclusive; sequence(a, b) is inclusive. The
    // textual form (literal start, one paren-nesting level in the end
    // arg) preserves the argument's integer TYPE — a sequence over INT
    // yields INT lambda vars for element_at — and stays legal inside
    // Generate (explode), where a SQL UDF is not; duck_range catches
    // the rest.
    s = s.replaceAll("""\brange\((\d+),\s*((?:[^()]|\([^()]*\))*)\)""",
      "sequence($1, ($2) - 1)")
    s = s.replaceAll("""\brange\(""", "duck_range(")
    // array type syntax
    s = s.replace("DOUBLE[]", "ARRAY<DOUBLE>")
    // ANSI double-quoted identifiers (DuckDB) -> backticks (Spark);
    // oracle string literals are single-quoted, so this is unambiguous
    s = s.replaceAll("\"([A-Za-z_][A-Za-z0-9_]*)\"", "`$1`")
    // two-arg regexp_extract_all: DuckDB defaults to group 0 (whole
    // match), Spark to group 1 — make group 0 explicit (pattern arg is
    // a quoted literal in every oracle)
    s = s.replaceAll("""regexp_extract_all\(([^,()]+),\s*('[^']*')\)""",
      "regexp_extract_all($1, $2, 0)")
    // bare VARCHAR casts (Spark needs STRING or a length)
    s = s.replace("AS VARCHAR)", "AS STRING)")
    s
  }

  /** Oracles whose DuckDB form uses list functions get a hand-written
    * Spark-SQL equivalent here (same semantics, Spark dialect). */
  private val overrides: Map[String, String] = Map(
    "q103_containment" -> """
      WITH b0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
      ex AS (SELECT doc_id + 20000000 AS doc_id,
                    concat_ws(' ', slice(split(text, ' '), 1, CAST(size(split(text, ' ')) DIV 2 AS INT))) AS text
             FROM b0),
      u AS (SELECT doc_id, text FROM b0 UNION ALL SELECT doc_id, text FROM ex),
      sh0 AS (SELECT doc_id,
                array_distinct(IF(size(split(text, ' ')) >= 3,
                  transform(sequence(1, size(split(text, ' ')) - 2),
                    i -> concat_ws(' ', element_at(split(text, ' '), i),
                                   element_at(split(text, ' '), i + 1),
                                   element_at(split(text, ' '), i + 2))),
                  CAST(array() AS ARRAY<STRING>))) AS sh
              FROM u),
      s AS (SELECT doc_id, sh, size(sh) AS m FROM sh0 WHERE size(sh) > 0),
      p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   CAST((size(array_intersect(a.sh, b.sh)) * CAST(1000000 AS BIGINT)) DIV a.m AS DOUBLE) / 1000000 AS containment
            FROM s a JOIN s b ON a.doc_id <> b.doc_id)
      SELECT a_id, b_id, containment FROM p WHERE containment >= 0.5
      ORDER BY a_id, b_id""",
    "q33_minhash_lsh" -> """
      WITH s0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 10000000 < 250),
      u AS (SELECT doc_id, text FROM s0 UNION ALL SELECT doc_id + 10000000, text FROM s0),
      base AS (
        SELECT doc_id, text,
          array_distinct(IF(size(split(text, ' ')) >= 3,
            transform(sequence(1, size(split(text, ' ')) - 2),
              i -> concat_ws(' ', element_at(split(text, ' '), i),
                             element_at(split(text, ' '), i + 1),
                             element_at(split(text, ' '), i + 2))),
            CAST(array() AS ARRAY<STRING>))) AS sh
        FROM u),
      p AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          CAST(size(filter(a.sh, x -> array_contains(b.sh, x))) AS DOUBLE) /
          (size(a.sh) + size(b.sh) - size(filter(a.sh, x -> array_contains(b.sh, x)))) AS j,
          (md5(a.text) = md5(b.text)) AS ident
        FROM base a JOIN base b ON b.doc_id > a.doc_id)
      SELECT CAST(SUM(CASE WHEN j >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_slice,
             CAST(SUM(CASE WHEN ident THEN 1 ELSE 0 END) AS BIGINT) AS n_identical_slice,
             TRUE AS precision_exact, TRUE AS identical_all_found, TRUE AS recall_ok
      FROM p""",
    "q23_json_extract" -> """
      WITH t AS (SELECT CAST(nullif(regexp_extract(props, '"k":\s*(-?\d+)', 1), '') AS INT) AS k, value FROM events)
      SELECT k % 10 AS k_mod, CAST(COUNT(*) AS BIGINT) AS cnt, ROUND(AVG(value), 4) AS avg_value,
             MIN(k) AS min_k, MAX(k) AS max_k
      FROM t GROUP BY k % 10 ORDER BY k_mod""",
    "q32_ngram_jaccard" -> """
      WITH base AS (
        SELECT doc_id, source,
          array_distinct(IF(size(split(text, ' ')) >= 3,
            transform(sequence(1, size(split(text, ' ')) - 2),
              i -> concat_ws(' ', element_at(split(text, ' '), i),
                             element_at(split(text, ' '), i + 1),
                             element_at(split(text, ' '), i + 2))),
            CAST(array() AS ARRAY<STRING>))) AS sh
        FROM documents),
      pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          ROUND(CAST(size(filter(a.sh, x -> array_contains(b.sh, x))) AS DOUBLE) /
                (size(a.sh) + size(b.sh) - size(filter(a.sh, x -> array_contains(b.sh, x)))), 4) AS jaccard
        FROM base a JOIN base b ON a.source = b.source AND b.doc_id > a.doc_id
        WHERE a.doc_id % 25 = 0),
      r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY jaccard DESC, a_id, b_id) AS rn FROM pairs)
      SELECT a_id, b_id, jaccard, CAST(rn AS INT) AS rn FROM r WHERE rn <= 20 ORDER BY rn""",
    "q93_span_dedup" -> """
      WITH aug AS (
        SELECT doc_id,
               CASE WHEN doc_id % 4 = 1 THEN concat(text, ' subscribe to our newsletter now for daily updates and offers')
                    WHEN doc_id % 4 = 3 THEN concat(text, ' all rights reserved terms of service apply to this content')
                    ELSE text END AS t
        FROM documents),
      tk AS (SELECT doc_id, split(t, ' ') AS toks, size(split(t, ' ')) AS m FROM aug),
      g AS (SELECT doc_id, toks, m,
              IF(m >= 8, transform(sequence(1, m - 7), j -> concat_ws(' ', slice(toks, j, 8))),
                 CAST(array() AS ARRAY<STRING>)) AS grams
            FROM tk),
      ex AS (SELECT doc_id, explode(grams) AS gram FROM g),
      dup AS (SELECT gram FROM ex GROUP BY gram HAVING COUNT(*) >= 2),
      hits AS (SELECT e.doc_id, collect_set(e.gram) AS hs
               FROM (SELECT DISTINCT doc_id, gram FROM ex) e JOIN dup USING (gram)
               GROUP BY e.doc_id),
      cov AS (SELECT g.doc_id, g.toks, g.m, g.grams,
                     coalesce(h.hs, CAST(array() AS ARRAY<STRING>)) AS hs
              FROM g LEFT JOIN hits h ON g.doc_id = h.doc_id),
      cl AS (SELECT doc_id, m,
               IF(m < 8, sequence(1, m),
                 filter(sequence(1, m),
                   i -> size(filter(sequence(greatest(1, i - 7), least(i, m - 7)),
                            j -> array_contains(hs, element_at(grams, j)))) = 0)) AS keep_pos
             FROM cov)
      SELECT cl.doc_id, CAST(cl.m AS INT) AS n_tokens,
             CAST(cl.m - size(keep_pos) AS INT) AS n_removed,
             md5(concat_ws(' ', transform(keep_pos, i -> element_at(cov.toks, i)))) AS cleaned_md5
      FROM cl JOIN cov ON cl.doc_id = cov.doc_id
      ORDER BY cl.doc_id""",
    "q98_bigram_ppl" -> """
      WITH tk AS (SELECT doc_id, split(text, ' ') AS toks, size(split(text, ' ')) AS m FROM documents),
      tk2 AS (SELECT * FROM tk WHERE m >= 2),
      bi AS (SELECT doc_id, p.w1 AS w1, p.bg AS bg
             FROM tk2 LATERAL VIEW explode(transform(sequence(1, m - 1),
               i -> named_struct('w1', element_at(toks, i),
                                 'bg', concat_ws(' ', element_at(toks, i), element_at(toks, i + 1))))) x AS p),
      bgc AS (SELECT bg, COUNT(*) AS c_bg FROM bi GROUP BY bg),
      uc AS (SELECT explode(toks) AS w1 FROM tk),
      unic AS (SELECT w1, COUNT(*) AS c_w1 FROM uc GROUP BY w1),
      v AS (SELECT COUNT(*) AS v FROM unic),
      sc AS (SELECT bi.doc_id,
               -ln((bgc.c_bg + 1) / CAST(unic.c_w1 + v.v AS DOUBLE)) / ln(2) AS nll
             FROM bi JOIN bgc USING (bg) JOIN unic USING (w1) CROSS JOIN v)
      SELECT doc_id, CAST(COUNT(*) AS INT) AS n_bigrams, ROUND(AVG(nll), 6) AS nll_r
      FROM sc GROUP BY doc_id ORDER BY doc_id""",
    "q48_asof_join" -> """
      WITH ords AS (
        SELECT o_orderkey, o_custkey, unix_timestamp(CAST(o_orderdate AS TIMESTAMP)) AS ord_sec, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey, unix_timestamp(CAST(o_orderdate AS TIMESTAMP))
                                  ORDER BY o_orderkey DESC) AS rn
        FROM orders),
      dedup AS (SELECT * FROM ords WHERE rn = 1),
      ev AS (SELECT event_id, user_id, ts div 1000000000 AS ev_sec FROM events),
      u AS (SELECT ev_sec AS t, 1 AS side, event_id, user_id AS k,
                   CAST(NULL AS BIGINT) AS ok, CAST(NULL AS DOUBLE) AS tp FROM ev
            UNION ALL
            SELECT ord_sec, 0, CAST(NULL AS BIGINT), o_custkey, o_orderkey, o_totalprice FROM dedup),
      w AS (SELECT *,
              last_value(ok, true) OVER (PARTITION BY k ORDER BY t, side
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_orderkey,
              last_value(tp, true) OVER (PARTITION BY k ORDER BY t, side
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_totalprice
            FROM u)
      SELECT event_id, k AS user_id, last_orderkey, last_totalprice
      FROM w WHERE side = 1 ORDER BY event_id""",
    "q71_corpus_curation" -> """
      WITH base AS (
        SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ')) AS fp,
               size(split(text, ' ')) AS n_tokens,
               size(array_distinct(split(text, ' '))) AS n_distinct,
               size(filter(split(text, ' '), t -> t IN ('the','a','of','and','to'))) AS s_en,
               size(filter(split(text, ' '), t -> t IN ('el','la','de','y','que'))) AS s_es,
               size(filter(split(text, ' '), t -> t IN ('le','la','et','les','des'))) AS s_fr,
               size(filter(split(text, ' '), t -> t IN ('der','die','und','das','ein'))) AS s_de
        FROM documents),
      lang AS (SELECT *, CASE
                 WHEN s_en >= greatest(s_en, s_es, s_fr, s_de) AND s_en > 0 THEN 'en'
                 WHEN s_es >= greatest(s_en, s_es, s_fr, s_de) AND s_es > 0 THEN 'es'
                 WHEN s_fr >= greatest(s_en, s_es, s_fr, s_de) AND s_fr > 0 THEN 'fr'
                 WHEN s_de >= greatest(s_en, s_es, s_fr, s_de) AND s_de > 0 THEN 'de'
                 ELSE 'und' END AS lang_pred
               FROM base),
      dedup AS (SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS keep_id FROM lang)
      SELECT doc_id, fp, CAST(n_tokens AS INT) AS n_tokens
      FROM dedup
      WHERE doc_id = keep_id
        AND n_tokens >= 20 AND CAST(n_distinct AS DOUBLE) / n_tokens >= 0.3
        AND lang_pred = 'en'
        AND ((doc_id * 2654435761) % 4294967296) < 2147483648
      ORDER BY doc_id""",
    "q81_line_dedup" -> """
      WITH aug AS (SELECT doc_id,
          concat(text, char(10), text, char(10), 'tail marker ', CAST(doc_id AS STRING)) AS t
        FROM documents),
      l AS (SELECT doc_id, pos, line
            FROM aug LATERAL VIEW posexplode(split(t, char(10))) x AS pos, line),
      f AS (SELECT doc_id, line, MIN(pos) AS fpos, COUNT(*) AS occ
            FROM l GROUP BY doc_id, line)
      SELECT doc_id, CAST(SUM(occ) AS INT) AS n_lines,
             CAST(COUNT(*) AS INT) AS n_unique,
             md5(concat_ws(char(10),
               transform(array_sort(collect_list(struct(fpos, line))), s -> s.line))) AS dedup_md5
      FROM f GROUP BY doc_id ORDER BY doc_id""",
    "q43_multimodal_decode" -> """
      SELECT doc_id,
             aggregate(transform(sequence(0, 7),
               i -> CAST(ascii(substring(text, ((i * 31) % length(text)) + 1, 1)) AS BIGINT)),
               0L, (acc, x) -> acc + x) AS byte_sum,
             8 AS feature_dim
      FROM documents ORDER BY doc_id""",
    "q84_repetition_profile" -> """
      WITH aug AS (SELECT doc_id,
          concat(text, char(10),
                 CASE WHEN doc_id % 3 = 0 THEN text
                      ELSE concat('tail marker ', CAST(doc_id AS STRING)) END,
                 char(10), 'end ', CAST(doc_id % 7 AS STRING)) AS t
        FROM documents),
      lines AS (SELECT doc_id, line AS key FROM aug
                LATERAL VIEW explode(split(t, char(10))) x AS line),
      lcnt AS (SELECT doc_id, key, COUNT(*) AS cnt FROM lines GROUP BY doc_id, key),
      lagg AS (SELECT doc_id, SUM(cnt) AS n_l, COUNT(*) AS u_l,
                      SUM(cnt * length(key)) AS lch,
                      SUM(CASE WHEN cnt >= 2 THEN cnt * length(key) ELSE 0L END) AS dlch
               FROM lcnt GROUP BY doc_id),
      toks AS (SELECT doc_id, split(replace(t, char(10), ' '), ' ') AS tk FROM aug),
      g2 AS (SELECT doc_id, g AS key FROM toks
             LATERAL VIEW explode(IF(size(tk) >= 2,
               transform(sequence(1, size(tk) - 1),
                 i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1))),
               CAST(array() AS ARRAY<STRING>))) x AS g),
      g2c AS (SELECT doc_id, key, COUNT(*) AS cnt FROM g2 GROUP BY doc_id, key),
      g2a AS (SELECT doc_id, MAX(cnt) AS g2m, SUM(cnt) AS g2t FROM g2c GROUP BY doc_id),
      g3 AS (SELECT doc_id, g AS key FROM toks
             LATERAL VIEW explode(IF(size(tk) >= 3,
               transform(sequence(1, size(tk) - 2),
                 i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2))),
               CAST(array() AS ARRAY<STRING>))) x AS g),
      g3c AS (SELECT doc_id, key, COUNT(*) AS cnt FROM g3 GROUP BY doc_id, key),
      g3a AS (SELECT doc_id, SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0L END) AS g3r,
                     SUM(cnt) AS g3t FROM g3c GROUP BY doc_id),
      m AS (SELECT l.doc_id, CAST(n_l AS INT) AS n_lines,
                   CAST(n_l - u_l AS DOUBLE) / n_l AS dup_line_frac,
                   CAST(dlch AS DOUBLE) / lch AS dup_line_char_frac,
                   coalesce(CAST(g2m AS DOUBLE) / g2t, 0D) AS top_2gram_frac,
                   coalesce(CAST(g3r AS DOUBLE) / g3t, 0D) AS rep_3gram_frac
            FROM lagg l LEFT JOIN g2a USING (doc_id) LEFT JOIN g3a USING (doc_id))
      SELECT doc_id, n_lines, dup_line_frac, dup_line_char_frac,
             top_2gram_frac, rep_3gram_frac,
             CAST(dup_line_frac <= 0.3 AND dup_line_char_frac <= 0.3 AND
                  top_2gram_frac <= 0.2 AND rep_3gram_frac <= 0.18 AS INT) AS pass_gate
      FROM m ORDER BY doc_id""",
    "q85_decontaminate" -> """
      WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
      btok AS (SELECT split(text, ' ') AS tk FROM bench),
      bg AS (SELECT DISTINCT g AS gram FROM btok
             LATERAL VIEW explode(IF(size(tk) >= 5,
               transform(sequence(1, size(tk) - 4),
                 i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1),
                                element_at(tk, i + 2), element_at(tk, i + 3), element_at(tk, i + 4))),
               CAST(array() AS ARRAY<STRING>))) x AS g),
      aug AS (SELECT d.doc_id,
                CASE WHEN d.doc_id % 7 = 3
                     THEN concat(d.text, ' ', concat_ws(' ', slice(split(b.text, ' '), 1, 5)))
                     ELSE d.text END AS t
              FROM documents d JOIN bench b ON b.doc_id = (d.doc_id DIV 50) * 50
              WHERE d.doc_id % 50 <> 0),
      dtok AS (SELECT doc_id, split(t, ' ') AS tk FROM aug),
      dg AS (SELECT doc_id, array_distinct(IF(size(tk) >= 5,
               transform(sequence(1, size(tk) - 4),
                 i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1),
                                element_at(tk, i + 2), element_at(tk, i + 3), element_at(tk, i + 4))),
               CAST(array() AS ARRAY<STRING>))) AS gs
             FROM dtok),
      x AS (SELECT doc_id, size(gs) AS n_grams, gram FROM dg
            LATERAL VIEW explode(gs) e AS gram)
      SELECT x.doc_id, CAST(COUNT(*) AS INT) AS n_hits,
             CAST(MIN(n_grams) AS INT) AS n_grams
      FROM x JOIN bg USING (gram) GROUP BY x.doc_id ORDER BY x.doc_id""",
    // Spark's recursive CTE only accepts UNION ALL, which cannot close a
    // cyclic reachability set, so the closure is UNROLLED min-label
    // propagation. Exact here, not approximate: q83's edges live inside
    // {id, id+1M, id+2M} families, so every component has diameter <= 2
    // and two propagation rounds already reach the fixpoint (four kept
    // for margin). The DuckDB oracle stays fully general.
    "q83_dup_components" -> {
      val step = (t: Int) =>
        s"""l$t AS (SELECT id, MIN(comp) AS comp FROM (
              SELECT l.id, l.comp FROM l${t - 1} l
              UNION ALL
              SELECT e.u AS id, l.comp FROM edges e JOIN l${t - 1} l ON l.id = e.v) cand
            GROUP BY id)"""
      s"""
      WITH base AS (SELECT doc_id, text, size(split(text, ' ')) AS m FROM documents),
      corpus AS (
        SELECT doc_id, text FROM base
        UNION ALL
        SELECT doc_id + 1000000,
               CASE WHEN m * 3 DIV 10 >= 1 THEN concat(text, ' ',
                 concat_ws(' ', transform(sequence(1, m * 3 DIV 10), i -> concat('zq', i))))
               ELSE text END
        FROM base
        UNION ALL
        SELECT doc_id + 2000000,
               CASE WHEN m * 6 DIV 10 >= 1 THEN concat(text, ' ',
                 concat_ws(' ', transform(sequence(1, m * 6 DIV 10), i -> concat('zq', i))))
               ELSE text END
        FROM base),
      sh AS (SELECT doc_id, doc_id % 1000000 AS fam,
               array_distinct(IF(size(split(text, ' ')) >= 3,
                 transform(sequence(1, size(split(text, ' ')) - 2),
                   i -> concat_ws(' ', element_at(split(text, ' '), i),
                                  element_at(split(text, ' '), i + 1),
                                  element_at(split(text, ' '), i + 2))),
                 CAST(array() AS ARRAY<STRING>))) AS sh
             FROM corpus),
      pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM sh a JOIN sh b ON a.fam = b.fam AND b.doc_id > a.doc_id
        WHERE CASE WHEN size(a.sh) + size(b.sh) - size(filter(a.sh, x -> array_contains(b.sh, x))) = 0
                   THEN false
                   ELSE CAST(size(filter(a.sh, x -> array_contains(b.sh, x))) AS DOUBLE) /
                        (size(a.sh) + size(b.sh) - size(filter(a.sh, x -> array_contains(b.sh, x)))) >= 0.7
              END),
      edges AS (SELECT a_id AS u, b_id AS v FROM pairs UNION SELECT b_id, a_id FROM pairs),
      l0 AS (SELECT DISTINCT u AS id, u AS comp FROM edges),
      ${(1 to 4).map(step).mkString(",\n      ")}
      SELECT id AS doc_id, comp AS component,
             CAST(COUNT(*) OVER (PARTITION BY comp) AS INT) AS csize
      FROM l4 ORDER BY doc_id"""
    })

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val wanted = args.drop(1).toSet
    val spark = Tables.session(8)
    // DuckDB string semantics: backslashes in single-quoted literals are
    // LITERAL (no escape processing) — exactly what this flag gives
    // Spark's parser, so regex-bearing oracles replay unmodified
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    installShims(spark)
    Tables.names.foreach(n => Tables(spark, dir, n).createOrReplaceTempView(n))
    // q99's DuckDB oracle reads the reference CSV via read_csv(columns=…);
    // the override replays it against this explicit-schema view instead
    graft.pipeline.CarPricePipeline.loadExplicit(spark,
      "/root/reference/CarPrice_Assignment.csv").createOrReplaceTempView("carprice_raw")

    val oracles = SparkEntry.oracleSql
    var pass = 0; var fail = 0; var skip = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if wanted.isEmpty || wanted.contains(name)) {
      oracles.get(name) match {
        case None => skip += 1
        case Some(sql) =>
          try {
            val actual = canon(fn(spark, dir))
            val variants: Seq[(String, String)] =
              if (overrides.contains(name) && !sys.env.contains("EMU_NO_OVERRIDE"))
                Seq("override" -> overrides(name))
              else if (sql.contains("epoch_ns")) Seq(
                "ns" -> rewrite(sql, "ts"),
                "us" -> rewrite(sql, "((ts div 1000) * 1000)"))
              else Seq("plain" -> rewrite(sql, "ts"))
            val bad = variants.flatMap { case (tag, vsql) =>
              val exp =
                try Right(canon(spark.sql(vsql)))
                catch { case e: Exception => Left(s"$tag: SQL error ${e.getMessage.take(200)}") }
              exp match {
                case Left(err) => Some(err)
                case Right(rows) => diff(actual, rows).map(d => s"$tag: $d")
              }
            }
            if (bad.isEmpty) { pass += 1; println(s"[emu] PASS $name") }
            else { fail += 1; println(s"[emu] FAIL $name :: ${bad.head}") }
          } catch {
            case e: Exception =>
              fail += 1
              println(s"[emu] FAIL $name :: query error ${e.getMessage.take(200)}")
          }
      }
    }
    println(s"[emu] done pass=$pass fail=$fail skipped_no_oracle=$skip")
    spark.stop()
  }

  /** Columns sorted by name (the driver's compare does this), rows as the
    * query emitted them, every cell stringified exactly. */
  private def canon(df: DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().toSeq
      .map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) "NULL" else r.get(i).toString))
  }

  private def diff(a: Seq[Seq[String]], b: Seq[Seq[String]]): Option[String] = {
    if (a.length != b.length) return Some(s"rows ${a.length} vs ${b.length}")
    a.zip(b).zipWithIndex.collectFirst {
      case ((x, y), i) if x != y => s"row $i: $x vs $y"
    }
  }
}
