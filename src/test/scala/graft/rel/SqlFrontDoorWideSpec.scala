package graft.rel

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Mechanical DuckDB→Spark dialect rewriter for the committed oracle SQL.
  *
  * The committed oracles are near-ANSI; what keeps most of them from
  * running verbatim through `spark.sql` is a SMALL, closed set of
  * dialect spellings (DuckDB's `string_split`/`len`/`unnest`/`epoch*`,
  * `//` integer division, `list_*` lambda functions, 1-based `[i]`
  * indexing, `read_parquet` TVF, DECIMAL-typed fraction literals). Each
  * rule below renames ONE such spelling to Spark's; rules are applied in
  * order (prefix-sensitive: `epoch_ms(` before `epoch(`, `10000.0`
  * before `100.0`). Structural differences that one token rename can't
  * express (QUALIFY, zipping parallel `unnest`s, lateral
  * `generate_series`) are per-query patches in
  * [[SqlFrontDoorWideSpec.patches]], each documented where applied.
  *
  * Regex/translate literals are parsed with
  * `spark.sql.parser.escapedStringLiterals=true` for the twin run —
  * DuckDB string literals treat backslash literally, and that Spark conf
  * (public, built for exactly this compatibility) makes Spark's parser
  * agree, so `'\b(a|an|the)\b'` means the same pattern in both dialects.
  */
object Duck2Spark {

  /** Ordered mechanical renames. Every rule is a plain-text or regex
    * substitution whose left side cannot occur inside the oracles' data
    * literals (checked by the twins themselves: a bad rewrite fails the
    * row-for-row assertion). */
  val rules: Seq[(String, String)] = Seq(
    // file-scan TVF → Spark's path-table syntax
    ("""read_parquet\('([^']+)'\)""", "parquet.`$1`"),
    // tokenize / list functions
    ("string_split\\(", "split("),
    ("\\blen\\(", "size("),
    ("strlen\\(", "octet_length("),
    ("list_transform\\(", "transform("),
    ("list_filter\\(", "filter("),
    ("list_contains\\(", "array_contains("),
    ("list_distinct\\(", "array_distinct("),
    ("list_sort\\(", "array_sort("),
    ("list_min\\(", "array_min("),
    ("list_max\\(", "array_max("),
    ("list_concat\\(", "concat("),
    ("list_slice\\(", "slice("),
    ("list_extract\\(", "element_at("),
    ("list_prepend\\(", "array_prepend("),
    ("array_to_string\\(", "array_join("),
    // list_aggregate(X, 'sum') — the rename splits across the two ends
    // of the call, so both halves are plain-text rules
    ("list_aggregate\\(", "aggregate("),
    (",\\s*'sum'\\)", ", 0L, (la_acc, la_el) -> la_acc + la_el)"),
    // JSON
    ("json_extract_string\\(", "get_json_object("),
    // epoch family (longest prefix first)
    ("""epoch_ns\(([A-Za-z_.]+)\)""", "(unix_micros($1) * 1000)"),
    ("epoch_ms\\(", "unix_millis("),
    ("epoch\\(", "unix_seconds("),
    // DuckDB integer division
    ("\\s//\\s", " div "),
    // types
    ("AS VARCHAR\\)", "AS STRING)"),
    ("""::DOUBLE\[\]""", " :: ARRAY<DOUBLE>"),
    // regexp_replace global flag: Spark's 3-arg form IS global
    (",\\s*'g'\\)", ")"),
    // DuckDB regexp_extract_all defaults to group 0, Spark to group 1
    ("""regexp_extract_all\(([^,]+), ('[^']+')\)""", "regexp_extract_all($1, $2, 0)"),
    // exact quantile → Spark's interpolating exact percentile
    ("quantile_cont\\(", "percentile("),
    // generators: single-column unnest → explode (parallel/zipping
    // unnests need the posexplode patch, applied per query BEFORE rules);
    // any generate_series left after the lateral patch is select-position
    ("unnest\\(", "explode("),
    ("generate_series\\(", "sequence("),
    // DECIMAL-typed fraction literals → DOUBLE scientific literals, so
    // BIGINT/DECIMAL division doesn't retype the rounded columns
    ("10000\\.0", "1e4"), ("\\b100\\.0", "1e2"), ("\\b0\\.5\\b", "5e-1"),
    ("\\b1\\.0\\b", "1e0"))

  def mechanical(sql: String): String =
    rules.foldLeft(sql) { case (s, (from, to)) => s.replaceAll(from, to) }

  /** DuckDB `FROM t, unnest(generate_series(a, b)) AS u(i)` (lateral,
    * per-row) → Spark `FROM t LATERAL VIEW explode(sequence(a, b)) u AS
    * i`. Applied BEFORE [[mechanical]] (which would otherwise turn the
    * TVF `unnest` into a non-lateral `explode`). */
  def lateralSeries(sql: String): String =
    sql.replaceAll(
      """,\s*unnest\(generate_series\((.+?)\)\)\s+AS\s+(\w+)\((\w+)\)""",
      " LATERAL VIEW explode(sequence($1)) $2 AS $3")

  /** The committed zip-unnest tokenizer CTE (q23/q86/q94 and friends):
    * DuckDB zips two parallel `unnest`s positionally; Spark spells that
    * relation `posexplode` (1-based via pos+1). */
  val zipToksDuck: String =
    """SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
         FROM documents"""
  val zipToksSpark: String =
    """SELECT doc_id, tok, CAST(pos0 + 1 AS BIGINT) AS pos
         FROM (SELECT doc_id, posexplode(split(text, ' ')) AS (pos0, tok) FROM documents)"""
}

/** Full-catalog SQL-front-door ledger ([[SqlFrontDoorSpec]]'s scaladoc
  * names this suite): every key in `SparkEntry.oracleSql` is classified
  * exactly once as (a) verbatim-ANSI (asserted in [[SqlFrontDoorSpec]]),
  * (b) hand-adapted there, (c) mechanically adapted HERE via
  * [[Duck2Spark]] (+ a documented per-query patch where the difference
  * is structural), or (d) a NAMED dialect gap with the blocking feature
  * spelled out. The ledger test fails on any unclassified or
  * doubly-classified oracle, so a new query cannot land without a
  * front-door story.
  */
object SqlFrontDoorWideSpec {

  /** name → (patch applied before the mechanical rules, note). An
    * identity patch means the mechanical rules alone suffice. */
  val adapted: Map[String, (String => String, String)] = {
    def id(s: String): String = s
    def m(pairs: (String, (String => String, String))*) = Map(pairs: _*)
    m(
      "q06_range_join" -> (id _, "epoch_ns + // div"),
      "q178_bm25_served" -> (id _,
        "q104's oracle verbatim (served postings recompute the identical " +
          "expression); same renames as the q104 hand twin, mechanical here"),
      "q180_bm25_cdc" -> (id _,
        "q104's oracle verbatim again (the CDC-maintained posting state " +
          "must serve the identical scores); same mechanical renames"),
      "q179_bm25_eval" -> ((s: String) => s.replace("1000000.0", "1e6"),
        "q176's 1e6 literal patch + mechanical renames; ln/FILTER/LEAST " +
          "parse identically"),
      "q176_retrieval_metrics" -> ((s: String) => s.replace("1000000.0", "1e6"),
        "micro-unit literal 1000000.0 → 1e6 (DECIMAL-typed in Spark's parser, " +
          "which would retype the BIGINT/literal divisions the metrics end on; " +
          "the q117 CAST-to-DECIMAL spelling sidesteps this, the bare-double " +
          "metric columns here cannot) + string_split/unnest renames"),
      "q15_string_funcs" -> ((s: String) =>
        s.replace("regexp_matches(p_name, 'bolt|ring')", "(p_name RLIKE 'bolt|ring')"),
        "regexp_matches → RLIKE"),
      "q16_date_funcs" -> ((s: String) => s
        .replace("(isodow(o_orderdate) - 1)", "weekday(o_orderdate)")
        .replace("datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')",
                 "datediff(DATE '2000-01-01', CAST(o_orderdate AS DATE))"),
        "isodow→weekday; datediff('day',a,b)→datediff(b,a)"),
      "q17_math_funcs" -> (id _, "fraction-literal typing only"),
      "q18_array_funcs" -> ((s: String) => s
        .replace("string_split(p_name, ' ')[1]", "string_split(p_name, ' ')[0]"),
        "1-based [i] → 0-based"),
      "q19_json_funcs" -> (id _, "json_extract_string → get_json_object"),
      "q20_explode_tokens" -> ((s: String) =>
        """SELECT doc_id, CAST(pos AS BIGINT) AS pos, tok
           FROM (SELECT doc_id, posexplode(split(text, ' ')) AS (pos, tok)
                 FROM documents WHERE doc_id < 50)
           ORDER BY doc_id, pos""",
        "parallel unnest zip → posexplode (0-based in both)"),
      "q68_exact_quantile" -> ((s: String) =>
        s.replaceAll("""quantile_disc\((\w+), ([0-9.]+)\)""",
          "percentile_disc($2) WITHIN GROUP (ORDER BY $1)"),
        "quantile_disc(col,q) → ANSI percentile_disc(q) WITHIN GROUP — same " +
          "exact-decimal ⌈q·n⌉ rank (the full-sort twin checks the " +
          "binary-search DataFrame form)"),
      "q22_dedup_keyed" -> ((s: String) =>
        """SELECT user_id, event_type, event_id, ts_us FROM (
             SELECT user_id, event_type, event_id, (unix_micros(ts) * 1000) div 1000 AS ts_us,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
             FROM events) WHERE rn = 1
           ORDER BY user_id, event_type""",
        "QUALIFY → windowed subquery"),
      "q23_dedup_near_jaccard" -> ((s: String) =>
        s.replace(Duck2Spark.zipToksDuck, Duck2Spark.zipToksSpark),
        "zip-unnest tokenizer → posexplode"),
      "q24_knn_cosine" -> ((s: String) => s
        .replace("embedding::DOUBLE[]", "CAST(embedding AS ARRAY<DOUBLE>)")
        .replaceAll("""list_cosine_similarity\(qv, v\)""",
          "(aggregate(zip_with(qv, v, (x, y) -> x * y), 0d, (s, t) -> s + t) " +
          "/ (sqrt(aggregate(qv, 0d, (s, t) -> s + t * t)) " +
          "* sqrt(aggregate(v, 0d, (s, t) -> s + t * t))))"),
        "list_cosine_similarity → zip_with/aggregate algebra"),
      "q25_text_stats" -> (id _, "len/string_split renames"),
      "q26_sessionize" -> (id _, "epoch_ns + // div"),
      "q27_tumbling_window" -> (id _, "epoch → unix_seconds"),
      "q28_top_terms" -> (id _, "unnest → explode"),
      "q29_text_quality" -> ((s: String) => s
        .replace("['a','an','the','of','in','on','and','or','to','is','are','was','it']",
                 "array('a','an','the','of','in','on','and','or','to','is','are','was','it')"),
        "[..] array literal → array(..)"),
      "q30_fusion_parse" -> (id _, "VARCHAR → STRING (regex parses raw via escapedStringLiterals)"),
      "q31_normalize_em" -> (id _, "4-arg regexp_replace 'g' flag → Spark 3-arg global"),
      "q32_multimodal_features" -> ((s: String) => s
        .replace("octet_length(CAST(text AS BLOB))",
                 "CAST(octet_length(CAST(text AS BINARY)) AS BIGINT)"),
        "BLOB → BINARY (+ BIGINT width) — gap closed in round 9: the " +
          "declared output is scalar, so the binary synthesis inside the " +
          "DataFrame path needs no SQL spelling"),
      "q33_token_count" -> (id _, "list_aggregate sum → aggregate lambda; group-0 regexp_extract_all"),
      "q37_lang_id" -> (id _, "// div"),
      "q40_rag_eval_pipeline" -> (id _, "read_parquet → parquet.`path`"),
      "q41_rag_eval_probability" -> (id _, "read_parquet + VARCHAR"),
      "q44_dedup_embedding" -> ((s: String) => s
        .replace("embedding::DOUBLE[]", "CAST(embedding AS ARRAY<DOUBLE>)")
        .replaceAll("""list_cosine_similarity\(a\.v, b\.v\)""",
          "(aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0d, (s, t) -> s + t) " +
          "/ (sqrt(aggregate(a.v, 0d, (s, t) -> s + t * t)) " +
          "* sqrt(aggregate(b.v, 0d, (s, t) -> s + t * t))))"),
        "list_cosine_similarity → zip_with/aggregate algebra"),
      "q45_custom_expr_normalize" -> (id _, "4-arg regexp_replace 'g' flag → 3-arg global"),
      "q46_rag_annotate_stub" -> (id _, "read_parquet → parquet.`path`"),
      "q49_percentiles" -> (id _, "quantile_cont → percentile"),
      "q50_stats" -> (id _, "fraction-literal typing only"),
      "q52_string_agg" -> ((s: String) =>
        """SELECT p_type, listagg(b, ',') WITHIN GROUP (ORDER BY b) AS brands,
                  COUNT(*) AS n_brands
           FROM (SELECT DISTINCT p_type, p_brand AS b FROM part)
           GROUP BY p_type ORDER BY p_type""",
        "string_agg(x, sep ORDER BY x) → listagg WITHIN GROUP"),
      "q56_null_safety" -> ((s: String) =>
        s.replace("o_totalprice / (o_custkey % 3)",
                  "try_divide(o_totalprice, o_custkey % 3)"),
        "ANSI ÷0 → try_divide (DuckDB NULLs a 0 divisor the same way)"),
      "q57_stream_batch_parity" -> (id _, "epoch → unix_seconds"),
      "q59_rag_eval_prompt" -> (id _, "read_parquet → parquet.`path`"),
      "q58_parse_extract" -> ((s: String) => s
        .replace("string_split(text, ' ')[1]", "string_split(text, ' ')[0]"),
        "1-based [i] → 0-based; element_at(-1) keeps DuckDB's tail pick"),
      "q60_ngrams" -> ((s: String) => Duck2Spark.lateralSeries(s)
        .replace("SELECT doc_id, unnest(t) AS g FROM toks",
                 "SELECT doc_id, explode(t) AS g FROM toks")
        .replaceAll("""t\[i\]""", "element_at(t, i)")
        .replaceAll("""t\[i\+1\]""", "element_at(t, i+1)")
        .replaceAll("""t\[i \+ 1\]""", "element_at(t, i + 1)")
        .replaceAll("""t\[i\+2\]""", "element_at(t, i+2)")
        .replaceAll("""t\[i \+ 2\]""", "element_at(t, i + 2)"),
        "lateral generate_series → LATERAL VIEW explode(sequence); [i] → element_at"),
      "q61_text_scrub" -> ((s: String) => Duck2Spark.lateralSeries(s)
        .replaceAll("""t\[i\]""", "element_at(t, i)")
        .replaceAll("""t\[i\+1\]""", "element_at(t, i+1)")
        .replaceAll("""t\[i\+2\]""", "element_at(t, i+2)"),
        "lateral generate_series + [i] → element_at"),
      "q62_sliding_window" -> ((s: String) => Duck2Spark.lateralSeries(s)
        .replace("epoch(ts - date_trunc('hour', ts))",
                 "(unix_seconds(ts) - unix_seconds(date_trunc('hour', ts)))"),
        "epoch(interval) → unix_seconds difference; lateral series"),
      "q63_window_distribution" -> (id _, "fraction-literal typing only"),
      "q64_map_funcs" -> ((s: String) => s
        .replace("list_sum(list_transform(toks, x -> length(x)))",
                 "aggregate(transform(toks, x -> length(x)), 0L, (a, b) -> a + b)"),
        "list_sum → aggregate lambda"),
      "q65_csv_roundtrip" -> ((s: String) =>
        s.replace("MAX(o_orderdate) AS last_date",
                  "CAST(MAX(o_orderdate) AS DATE) AS last_date"),
        "the CSV round-trip types the date column DATE; DuckDB keeps parquet TIMESTAMP"),
      "q67_session_window" -> (id _, "epoch_ns + // div"),
      "q71_gap_fill" -> ((s: String) => s.replace(
        """FROM generate_series(DATE '1995-01-01', DATE '1995-03-31', INTERVAL 1 DAY) t(d)""",
        """FROM (SELECT explode(sequence(DATE '1995-01-01', DATE '1995-03-31', INTERVAL 1 DAY)) AS d)"""),
        "generate_series TVF → explode(sequence)"),
      "q72_media_resize_frames" -> ((s: String) =>
        s.replace("octet_length(CAST(text AS BLOB))", "octet_length(CAST(text AS BINARY))"),
        "BLOB → BINARY; // div"),
      "q73_reuse_annotations" -> (id _, "read_parquet + list_* renames"),
      "q74_media_decode" -> ((s: String) => Duck2Spark.lateralSeries(s),
        "lateral generate_series → LATERAL VIEW explode(sequence)"),
      "q77_variant_json" -> (id _, "json_extract_string → get_json_object"),
      "q79_range_frame" -> ((s: String) => s
        .replace("datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))",
                 "datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01')"),
        "datediff('day',a,b) → datediff(b,a)"),
      "q80_edit_distance" -> (id _, "4-arg regexp_replace 'g' flag → 3-arg global"),
      "q82_shard_pack" -> ((s: String) =>
        """WITH dd AS (
             SELECT doc_id, lang, size(split(text, ' ')) AS n_tokens FROM (
               SELECT doc_id, lang, text,
                 ROW_NUMBER() OVER (PARTITION BY md5(lower(text)) ORDER BY doc_id) AS rn
               FROM documents) WHERE rn = 1),
           c AS (
             SELECT doc_id, lang, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
             FROM dd)
           SELECT doc_id, lang, n_tokens,
                  CAST((cum - n_tokens) div 4000 AS BIGINT) AS shard_id
           FROM c ORDER BY doc_id""",
        "QUALIFY → windowed subquery"),
      "q84_int8_quant" -> (id _, "embedding cast + list_* renames"),
      "q86_shingle_novelty" -> ((s: String) =>
        s.replace(Duck2Spark.zipToksDuck, Duck2Spark.zipToksSpark),
        "zip-unnest tokenizer → posexplode"),
      "q87_bmp_decode" -> ((s: String) => Duck2Spark.lateralSeries(s),
        "lateral generate_series"),
      "q89_vocab_oov" -> (id _, "unnest → explode; count_if is shared"),
      "q90_imageio_decode" -> ((s: String) => Duck2Spark.lateralSeries(s),
        "lateral generate_series"),
      "q91_iterative_counterfactual" -> (id _, "read_parquet → parquet.`path`"),
      "q94_decontaminate" -> ((s: String) =>
        s.replace(Duck2Spark.zipToksDuck, Duck2Spark.zipToksSpark),
        "zip-unnest tokenizer → posexplode"),
      "q96_sequence_pack" -> (id _, "// div"),
      "q107_embedding_norms" -> ((s: String) => s
        .replace("embedding::DOUBLE[]", "CAST(embedding AS ARRAY<DOUBLE>)")
        .replaceAll("""list_inner_product\(v\[1:16\], v\[1:16\]\)""",
          "aggregate(slice(v, 1, 16), 0d, (s, t) -> s + t * t)")
        .replaceAll("""list_inner_product\(v, v\)""",
          "aggregate(v, 0d, (s, t) -> s + t * t)"),
        "list_inner_product/[1:16] → aggregate/slice"),
      "q110_decayed_engagement" -> (id _, "epoch_ms → unix_millis"),
      "q111_avi_demux" -> ((s: String) => Duck2Spark.lateralSeries(s),
        "two stacked lateral series"),
      "q112_adpcm_decode" -> ((s: String) => s
        .replaceAll("""\[-1,-1,-1,-1,2,4,6,8\]\[\(n % 8\) \+ 1\]""",
          "array(-1,-1,-1,-1,2,4,6,8)[(n % 8)]")
        .replaceAll("""\[7,8,9,([0-9,]+),32767\]\[idx \+ 1\]""",
          "array(7,8,9,$1,32767)[idx]")
        // Spark parser quirk: an `array(...)` call earlier in the same
        // statement makes a later `>>` mis-lex as a type bracket, so the
        // shifts get the function spelling
        .replace("(st >> 3)", "shiftright(st, 3)")
        .replace("st >> 1", "shiftright(st, 1)")
        .replace("st >> 2", "shiftright(st, 2)"),
        "UNION ALL recursive CTE runs on Spark 4; [..][i+1] → array(..)[i] (0-based); >> → shiftright"),
      "q113_bilinear_resize" -> ((s: String) => Duck2Spark.lateralSeries(s),
        "three stacked lateral series + // div"),
      "q114_length_buckets" -> (id _, "// div"),
      "q115_mjpeg_frames" -> ((s: String) => Duck2Spark.lateralSeries(s),
        "two stacked lateral series"),
      "q116_pii_redact" -> (id _,
        "regexp 'g' flag → 3-arg global + group-0 regexp_extract_all + len → size"),
      "q117_perplexity_buckets" -> (id _,
        "string_split/len/unnest renames + // div"),
      "q118_mixture_resample" -> ((s: String) => Duck2Spark.lateralSeries(s),
        "lateral generate_series + // div"),
      "q119_topk_per_group" -> (id _,
        "plain ANSI windowed subquery — runs unmodified"),
      "q120_histogram_quantiles" -> ((s: String) =>
        s.replace("unnest([5e-1, 9e-1, 99e-2])", "explode(array(5e-1, 9e-1, 99e-2))"),
        "[..] array literal → array(..); unnest → explode"),
      "q127_dataset_card" -> (id _,
        "string_split/len renames + // div; md5/ln/windows parse identically"),
      "q131_quality_blend" -> ((s: String) => Duck2Spark.lateralSeries(
          s.replace("array_to_string(t[k+1 : k+3], ' ')",
            "array_join(slice(t, k + 1, 3), ' ')")),
        "lateral series + t[a:b] → slice(); rank-fraction algebra parses identically"),
      "q132_heldout_lm" -> (id _,
        "string_split/unnest renames; hash split, smoothing and DECIMAL sums parse identically"),
      "q133_pmi_collocations" -> ((s: String) => Duck2Spark.lateralSeries(
          s.replace("t[i+1] AS w1, t[i+2] AS w2", "t[i] AS w1, t[i+1] AS w2")),
        "lateral series + 1-based [i] → 0-based; PMI algebra parses identically"),
      "q136_zipf_slope" -> (id _,
        "string_split/unnest renames; DECIMAL least-squares algebra parses identically"),
      "q137_sequence_pack" -> (id _,
        "string_split/len renames + // div; window running sum parses identically"),
      "q138_quota_sample" -> ((s: String) =>
        """SELECT doc_id, source, lang, pri, rk FROM (
             SELECT doc_id, source, lang, (doc_id * 69069) % 65536 AS pri,
               CAST(ROW_NUMBER() OVER (PARTITION BY source, lang
                 ORDER BY (doc_id * 69069) % 65536, doc_id) AS BIGINT) AS rk
             FROM documents) WHERE rk <= 3
           ORDER BY doc_id""",
        "QUALIFY → windowed subquery"),
      "q139_split_leakage" -> ((s: String) =>
        s.replace(Duck2Spark.zipToksDuck, Duck2Spark.zipToksSpark),
        "zip-unnest tokenizer → posexplode (q23's patch); split predicate and " +
          "Jaccard algebra parse identically"),
      "q141_corpus_drift" -> ((s: String) => Duck2Spark.lateralSeries(s),
        "len/string_split renames + // div + the band-lattice lateral " +
          "generate_series; LEAST, micro-ln, DECIMAL band products and " +
          "the PSI fold parse identically"),
      "q142_line_dedup" -> ((s: String) =>
        """WITH pg AS (SELECT doc_id,
               concat(
                 array(CASE CAST(doc_id % 4 AS INT)
                         WHEN 0 THEN '== boilerplate header alpha =='
                         WHEN 1 THEN '== boilerplate header beta =='
                         WHEN 2 THEN '== boilerplate header gamma =='
                         ELSE '== boilerplate header delta ==' END),
                 transform(sequence(0, (size(split(text, ' ')) - 1) div 12),
                   i -> array_join(slice(split(text, ' '), i * 12 + 1, 12), ' ')),
                 array(concat('-- all rights reserved v',
                   CAST(doc_id % 5 AS STRING), ' --'))) AS ls
             FROM documents),
           ln AS (SELECT doc_id, pos, line
                  FROM pg LATERAL VIEW posexplode(ls) u AS pos, line),
           rk AS (SELECT doc_id, pos, line,
                    ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
                  FROM ln),
           reb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                     listagg(line, chr(10)) WITHIN GROUP (ORDER BY pos) AS clean
                   FROM rk WHERE rn = 1 GROUP BY doc_id)
           SELECT p.doc_id, CAST(size(p.ls) AS BIGINT) AS n_lines,
                  COALESCE(r.n_kept, CAST(0 AS BIGINT)) AS n_kept,
                  md5(COALESCE(r.clean, '')) AS clean_hash
           FROM pg p LEFT JOIN reb r ON p.doc_id = r.doc_id
           ORDER BY p.doc_id""",
        "list literals/`||` concat → array()/concat(); zip-unnest → " +
          "posexplode; string_agg(x, sep ORDER BY pos) → listagg WITHIN GROUP"),
      "q143_gopher_rules" -> ((s: String) => s
        .replace("list_intersect(", "array_intersect(")
        .replace("regexp_matches(", "regexp_like(")
        .replace("['the','a','to','of','and','in','on','is']",
                 "array('the','a','to','of','and','in','on','is')"),
        "list_intersect → array_intersect; regexp_matches → regexp_like; " +
          "[..] array literal → array(..); repeat/ratio algebra parses identically"),
      "q144_mojibake_repair" -> (id _,
        "4-arg regexp_replace 'g' flag → Spark 3-arg global; chr() and the " +
          "schedule CASE parse identically (twin equals the DataFrame result " +
          "precisely because repair inverts the wire corruption on every row)"),
      "q146_calibration_bins" -> ((s: String) => s.replaceAll(
          """(?s)list_inner_product\(v,\s*list_transform\(generate_series\(0, 63\),\s*j -> CAST\(\(j % 7\) - 3 AS DOUBLE\) / 10\.0\)\)""",
          "aggregate(zip_with(v, transform(sequence(0, 63), " +
            "j -> CAST((j % 7) - 3 AS DOUBLE) / 1e1), (x, y) -> x * y), " +
            "0d, (sa, t) -> sa + t)"),
        "list_inner_product vs fixed weights → zip_with/aggregate algebra " +
          "(q24's patch); bucket/ratio arithmetic parses identically"),
      "q147_source_coverage" -> (id _,
        "len/string_split renames; NOT IN, rank/cumsum windows and the " +
          "comma cross join against the 1-row total parse identically"),
      "q148_funnel" -> (id _,
        "fraction-literal typing only; chained CASE-window minima, the " +
          "UNION ALL stage pivot and count(col) parse identically"),
      "q149_retention_cohorts" -> ((s: String) => s.replace(
          "datediff('day', DATE '2024-01-01', CAST(ts AS DATE))",
          "datediff(CAST(ts AS DATE), DATE '2024-01-01')"),
        "datediff('day',a,b) → datediff(b,a); // div; cohort algebra " +
          "parses identically"),
      "q150_event_transitions" -> (id _,
        "fraction-literal typing only; LEAD with tie-broken ORDER BY and " +
          "the partitioned normalization window parse identically"),
      "q155_event_paths" -> (id _,
        "fraction-literal typing only; double LEAD, the 1-row comma cross " +
          "join and the tie-broken LIMIT parse identically"),
      "q156_random_projection" -> ((s: String) => Duck2Spark.lateralSeries(s)
        .replace("q[i]", "element_at(q, i)")
        .replaceAll("""list_sum\(""", "aggregate(")
        .replace("THEN 1 ELSE -1 END))", "THEN 1 ELSE -1 END), 0L, (ac, el) -> ac + el)"),
        "lateral generate_series + [i] → element_at + list_sum → aggregate " +
          "lambda; the nested sign-fold lambdas parse identically"),
      "q158_last_touch_attribution" -> ((s: String) => s.replace(
          "last_value(click_ch IGNORE NULLS)", "last_value(click_ch) IGNORE NULLS"),
        "IGNORE NULLS moves outside the call (Spark spelling); " +
          "json_extract_string → get_json_object mechanically; the " +
          "carry-forward window and DECIMAL revenue sum parse identically"),
      "q159_volume_anomalies" -> (id _,
        "epoch_ms → unix_millis + // div + fraction-literal typing; the " +
          "named WINDOW clause and integer RANGE frame parse identically " +
          "(the q79 precedent)"),
      "q166_temperature_mix" -> (id _,
        "len/string_split renames + fraction-literal typing; IEEE sqrt, " +
          "micro-rounding and the CROSS JOIN totals parse identically"),
      "q167_conversion_latency" -> ((s: String) =>
          s.replace("epoch_us(", "unix_micros("),
        "epoch_us → unix_micros; chained windows, hour/bin floors and the " +
          "q120 interpolation algebra parse identically"),
      "q165_k_anonymity" -> (id _,
        "fraction-literal typing only; the quasi-identifier grouping, " +
          "bounded cumulative window and CROSS JOIN total parse identically"),
      "q164_association_rules" -> (id _,
        "fraction-literal typing only (10000.0 -> 1e4 keeps the r4 columns " +
          "DOUBLE); CROSS JOIN, DECIMAL lift products and the integer " +
          "min-supp cut parse identically"),
      "q161_scd2_history" -> (id _,
        "json_extract_string → get_json_object + epoch_ms → unix_millis; " +
          "LAG change detection, version ROW_NUMBER and the LEAD interval " +
          "close parse identically"),
      "q162_centroid_eval" -> ((s: String) => Duck2Spark.lateralSeries(s)
        .replace("q[i]", "element_at(q, i)"),
        "lateral generate_series + [i] → element_at (the q124 idiom); " +
          "centroid floor-means, USING joins and the argmin subquery " +
          "parse identically"),
      "q157_knn_graph" -> ((s: String) => s
        .replaceAll("""list_sum\(""", "aggregate(")
        .replace("(a.q[i] - b.q[i]) * (a.q[i] - b.q[i])))",
          "(element_at(a.q, i) - element_at(b.q, i)) * " +
          "(element_at(a.q, i) - element_at(b.q, i))), 0L, (ac, el) -> ac + el)"),
        "[i] → element_at + list_sum → aggregate lambda (q156's patches); " +
          "the brute non-equi pair join runs as BroadcastNestedLoopJoin at " +
          "twin scale — the DataFrame tile kernel is the scale path"),
      "q154_unimax_alloc" -> (id _,
        "len/string_split renames + // div; the UNION ALL recursive " +
          "waterfill CTE runs on Spark 4 (the q112 precedent), LEAST and " +
          "the column-aliased CTE head parse identically"),
      "q151_url_canonical_dedup" -> ((s: String) => s
        .replace("string_split(nofrag, '?')", "split(nofrag, '[?]')")
        .replaceAll("""\[1\]""", "[0]").replaceAll("""\[2\]""", "[1]"),
        "literal-separator string_split('?') → regex split('[?]'); " +
          "1-based [i] → 0-based; lambda filter/sort rename mechanically"),
      "q152_fuzzy_entity_dedup" -> (id _,
        "plain ANSI — both dialects ship the same unit-cost levenshtein; " +
          "only the STRING cast alias is shared spelling"),
      "q153_html_extract" -> ((s: String) => s.replace(
          "list_slice(string_split(text, ' '), i * 12 + 1, i * 12 + 12)",
          "slice(split(text, ' '), i * 12 + 1, 12)"),
        "list_slice(a, lo, hi) end-index → slice(a, lo, LEN) (q142's patch); " +
          "regex 'g' flag → 3-arg global + list_*/generate_series renames; " +
          "the regex chain itself parses identically (RE2 and Java agree " +
          "on lazy bodies, negated classes and space runs)"))
  }

  /** Regression-fixture oracles (the q46 pattern, SF-pinned at the
    * driver gate's sf0.01 — see `DataQueries.fixtureOracle`): the oracle
    * is a committed expected-result read, not a semantic SQL spelling of
    * the computation, so there is no twin to assert — the DataFrame
    * catalog (and for ANN the recall specs) is the front door. q46/q91
    * differ: their DataFrame queries also read committed inputs, so they
    * carry real twins above. */
  val fixtureOracles: Set[String] = Set(
    "q09_approx_distinct", "q34_minhash_neardup", "q35_simhash_neardup",
    "q36_ann_lsh", "q39_ml_score", "q42_tfidf_retrieval", "q55_ann_ivf",
    "q75_ann_pq", "q76_ann_ivfpq", "q102_semdedup", "q121_bpe_merges",
    "q125_bpe_encode", "q128_mmr_select", "q135_compression_ratio",
    "q168_phash_neardup", "q169_beam_ann", "q170_beam_ann_vectors",
    "q171_knn_graph_approx", "q172_beam_ann_served",
    "q173_beam_ann_vectors_served", "q174_knn_graph_insert",
    "q175_knn_graph_delete", "q177_knn_graph_merge",
    "q181_unigram_vocab", "q182_unigram_encode")

  /** Oracles with NO Spark-SQL twin, each blocked by a named engine
    * feature (not by laziness) that the gap-pin tests below assert is
    * really absent: the DataFrame catalog remains the front door for
    * these. (q32's former entry here was closed in round 9 — its output
    * is scalar, so the twin is a BLOB→BINARY respelling.) */
  val gaps: Map[String, String] = Map(
    "q38_doc_fingerprint" -> ("128-bit modular hash: DuckDB HUGEINT carries (acc*131+ch) past " +
      "2^63 before % 2^61-ish; Spark has no INT128 and DECIMAL(38,0) lambdas lose the exact " +
      "wraparound the committed fingerprints pin"),
    "q53_union_by_name" -> ("UNION ALL BY NAME is DuckDB-only syntax; Spark exposes by-name " +
      "union solely through Dataset.unionByName (the DataFrame twin)"),
    "q81_dedup_clusters" -> ("WITH RECURSIVE ... UNION (distinct) fixpoint: Spark 4 recursive " +
      "CTEs require UNION ALL; the distinct-union transitive closure does not terminate under " +
      "UNION ALL on a cyclic edge set"),
    "q95_dedup_rewrite" -> "same UNION-distinct recursive closure as q81 (q95 composes it)")
}

class SqlFrontDoorWideSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def registerViews(): Unit =
    Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation", "region", "events", "documents", "embeddings")
      .foreach(n => Tables.load(spark, dir, n).createOrReplaceTempView(n))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString(""))

  /** Parse the twin with DuckDB's literal-backslash string semantics
    * (see [[Duck2Spark]]), restoring the session conf afterwards. */
  private def sqlRaw(sql: String): org.apache.spark.sql.DataFrame = {
    val key = "spark.sql.parser.escapedStringLiterals"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "true")
    try spark.sql(sql) finally spark.conf.set(key, prev)
  }

  SqlFrontDoorWideSpec.adapted.toSeq.sortBy(_._1).foreach { case (name, (patch, note)) =>
    test(s"$name: mechanically adapted twin matches the DataFrame result ($note)") {
      registerViews()
      val twin = Duck2Spark.mechanical(patch(graft.SparkEntry.oracleSql(name)))
      val viaSql = sqlRaw(twin)
      val viaDf = graft.SparkEntry.queries(name)(spark, dir)
      assert(viaSql.columns.toSeq == viaDf.columns.toSeq,
        s"$name: twin columns ${viaSql.columns.toSeq} != DataFrame ${viaDf.columns.toSeq}")
      val a = canon(viaSql); val b = canon(viaDf)
      assert(a == b, s"$name: twin diverges (${a.size} vs ${b.size} rows; first diff: " +
        s"${a.zip(b).find { case (x, y) => x != y }.orElse(Some((a.headOption, b.headOption)))})")
    }
  }

  // ---- gap pins: each named dialect gap is a TESTED negative assertion —
  // the blocking DuckDB construct is asserted absent from (or rejected by)
  // Spark's dialect, so the gap note cannot silently rot if a Spark
  // upgrade closes it (the pin fails and the twin gets written instead).

  test("gap pin q53: UNION ALL BY NAME is not Spark syntax " +
       "(by-name union exists only as Dataset.unionByName)") {
    val e = intercept[Exception] {
      spark.sql("SELECT 1 AS a, 2 AS b UNION ALL BY NAME SELECT 3 AS b, 4 AS a").collect()
    }
    assert(e.getMessage.toUpperCase.contains("SYNTAX") ||
      e.getMessage.toUpperCase.contains("PARSE"),
      s"expected a parser rejection, got: ${e.getMessage.take(200)}")
  }

  test("gap pin q81/q95: Spark 4 recursive CTEs reject the distinct-UNION " +
       "fixpoint the transitive-closure oracle needs (UNION ALL only)") {
    // the UNION ALL form terminates on acyclic input — supported
    assert(spark.sql("WITH RECURSIVE r(x) AS (SELECT 1 UNION ALL " +
      "SELECT x + 1 FROM r WHERE x < 3) SELECT * FROM r").collect().length == 3)
    // the distinct-UNION form (DuckDB's closure fixpoint over a CYCLIC
    // edge set, q81Oracle) is rejected — which is exactly why q81/q95
    // have no Spark twin: on a cyclic graph UNION ALL never terminates
    val e = intercept[Exception] {
      spark.sql("WITH RECURSIVE r(x) AS (SELECT 1 UNION " +
        "SELECT x + 1 FROM r WHERE x < 3) SELECT * FROM r").collect()
    }
    assert(e.getMessage.nonEmpty)
  }

  test("gap pin q38: no integral type past 64 bits — DECIMAL precision is " +
       "capped at 38 digits, below the 2^127 range the HUGEINT hash needs") {
    assert(org.apache.spark.sql.types.DecimalType.MAX_PRECISION == 38)
    val e = intercept[Exception] {
      spark.sql("SELECT CAST('1' AS DECIMAL(39,0))").collect()
    }
    assert(e.getMessage.nonEmpty)
  }

  test("ledger: every committed oracle is classified exactly once " +
       "(verbatim / adapted-here / adapted-wide / fixture / named gap)") {
    val verbatim = SqlFrontDoorSpec.verbatim.toSet
    val adaptedNarrow = SqlFrontDoorSpec.adaptedHere.toSet
    val adaptedWide = SqlFrontDoorWideSpec.adapted.keySet
    val gaps = SqlFrontDoorWideSpec.gaps.keySet
    val fixtures = SqlFrontDoorWideSpec.fixtureOracles
    val all = graft.SparkEntry.oracleSql.keySet
    val classes = Seq(verbatim, adaptedNarrow, adaptedWide, gaps, fixtures)
    for (Seq(a, b) <- classes.combinations(2))
      assert((a intersect b).isEmpty, s"doubly classified: ${a intersect b}")
    val classified = classes.reduce(_ union _)
    assert((all diff classified).isEmpty,
      s"oracles with no front-door story: ${(all diff classified).toSeq.sorted}")
    assert((classified diff all).isEmpty,
      s"ledger names unknown oracles: ${(classified diff all).toSeq.sorted}")
  }
}
