package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 corpus-hygiene wave (declared surface, SURVEY §2 Part B
  * continuation) — the four ingestion-time cleanup steps every web-scale
  * training corpus passes through BEFORE the dedup/quality/packing
  * operators the catalog already names:
  *
  *   - q142 line-level corpus dedup: remove every line that already
  *          occurred anywhere earlier in the corpus (C4's "discard any
  *          repeated three-sentence span" pass, at line granularity) and
  *          REASSEMBLE the surviving document text — boilerplate
  *          headers/footers vanish corpus-wide, first occurrence wins.
  *   - q143 Gopher quality rules: the published per-document filter
  *          thresholds (Rae et al. 2021, §A1.1) as individual flags plus
  *          the conjunctive keep decision — word count, mean word
  *          length, symbol-to-word ratio, alphabetic-word fraction,
  *          stopword presence.
  *   - q144 encoding repair: detect and unwind UTF-8-read-as-Latin-1
  *          double encoding (possibly stacked), the ftfy pass — the
  *          repaired text must hash-match the never-corrupted original.
  *   - q145 snapshot diff: itemized added/removed/changed between two
  *          corpus snapshots by content hash — the incremental-crawl
  *          planning query (q141 measures distribution drift; this names
  *          the individual documents).
  *
  * Oracle discipline as in [[Queries]]: BIGINT casts everywhere, r4
  * rounding via [[graft.Stable]], deterministic ORDER BY over a unique
  * key, one terminal double division per ratio with identical operands
  * in both engines.
  */
object HygieneQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---- q142: cross-corpus line-level dedup + rewrite ------------------------

  /** Boilerplate pools (4 headers × 5 footers keyed by doc_id) splice a
    * synthetic "page" around each document — the repeated chrome a crawler
    * actually sees — and the body chunks every 12 tokens into lines.
    * The '=='/'--' sigils keep chrome lines disjoint from body lines by
    * construction (the corpus alphabet is bare lowercase words). */
  private[graft] val pageLinesExpr =
    """concat(
         array(element_at(array(
           '== boilerplate header alpha ==', '== boilerplate header beta ==',
           '== boilerplate header gamma ==', '== boilerplate header delta =='),
           cast(doc_id % 4 + 1 as int))),
         transform(sequence(0, (size(split(text, ' ')) - 1) div 12),
           i -> array_join(slice(split(text, ' '), i * 12 + 1, 12), ' ')),
         array(element_at(array(
           '-- all rights reserved v0 --', '-- all rights reserved v1 --',
           '-- all rights reserved v2 --', '-- all rights reserved v3 --',
           '-- all rights reserved v4 --'),
           cast(doc_id % 5 + 1 as int))))"""

  /** C4-style line dedup: keep only the globally FIRST occurrence of every
    * distinct line (first = smallest (doc_id, position) over the whole
    * corpus — duplicates within one document dedup too), then reassemble
    * each document from its surviving lines in original order. Output per
    * document: page line count, surviving line count, and the md5 of the
    * reassembled text (empty string when every line was seen earlier).
    *
    * Scale shape: TWO exchanges total, both on natural keys. The
    * keeper-election is a groupBy(line).min(struct(doc_id, pos)) — a hash
    * aggregate with map-side partial combine, so a boilerplate line that
    * appears in a billion documents contributes ONE row per map partition
    * to the shuffle, never a billion-row hot partition (this is why the
    * election is an aggregate + join-back rather than a row_number()
    * window over the line key, whose per-key sort would serialize exactly
    * the hot lines). The join-back is line-keyed with a one-row build
    * side per key (AQE skew-split applies if a partition still runs hot);
    * reassembly is the second exchange, doc-keyed, with per-document
    * state bounded by the document's own line count. At 100 TB lines
    * would carry a 128-bit content hash instead of the string (the
    * q122 `dupSpansHashed` twin's trick) — the plan shape is unchanged. */
  def q142LineDedup(s: SparkSession, dir: String): DataFrame =
    lineDedup(t(s, dir, "documents").select(col("doc_id"),
      expr(pageLinesExpr).as("lines")))

  /** Core of q142 over any (doc_id, lines: array<string>) frame —
    * spec/library entry point. */
  def lineDedup(pages: DataFrame): DataFrame = {
    val lines = pages.select(col("doc_id"),
      posexplode(col("lines")).as(Seq("pos", "line")))
    val keepers = lines.groupBy("line")
      .agg(min(struct(col("doc_id"), col("pos"))).as("k"))
    val kept = lines.join(keepers, "line")
      .where(col("doc_id") === col("k.doc_id") && col("pos") === col("k.pos"))
      .select("doc_id", "pos", "line")
    val rebuilt = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            p => p.getField("line")), "\n").as("clean"))
    pages.select(col("doc_id"), size(col("lines")).cast("long").as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        md5(coalesce(col("clean"), lit(""))).as("clean_hash"))
      .orderBy("doc_id")
  }

  val q142Oracle: String =
    """WITH pg AS (SELECT doc_id,
           [CASE doc_id % 4 WHEN 0 THEN '== boilerplate header alpha =='
                            WHEN 1 THEN '== boilerplate header beta =='
                            WHEN 2 THEN '== boilerplate header gamma =='
                            ELSE '== boilerplate header delta ==' END]
           || list_transform(generate_series(0, (len(string_split(text, ' ')) - 1) // 12),
                i -> array_to_string(list_slice(string_split(text, ' '),
                       i * 12 + 1, i * 12 + 12), ' '))
           || ['-- all rights reserved v' || CAST(doc_id % 5 AS VARCHAR) || ' --'] AS ls
         FROM documents),
       ln AS (SELECT doc_id, unnest(ls) AS line,
                unnest(generate_series(0, len(ls) - 1)) AS pos
              FROM pg),
       rk AS (SELECT doc_id, pos, line,
                ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
              FROM ln),
       reb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                 string_agg(line, chr(10) ORDER BY pos) AS clean
               FROM rk WHERE rn = 1 GROUP BY doc_id)
       SELECT p.doc_id, CAST(len(p.ls) AS BIGINT) AS n_lines,
              COALESCE(r.n_kept, 0) AS n_kept,
              md5(COALESCE(r.clean, '')) AS clean_hash
       FROM pg p LEFT JOIN reb r ON p.doc_id = r.doc_id
       ORDER BY p.doc_id"""

  // ---- q143: Gopher quality-rule filter -------------------------------------

  /** The published Gopher document-filter rules (Rae et al. 2021, §A1.1)
    * as per-rule flags plus the conjunctive keep: word count ∈ [50, 100k],
    * mean word length ∈ [3, 10], symbol-to-word ratio ≤ 0.1 (here '#' and
    * '...' — the paper's hash/ellipsis rule), ≥ 80% of words contain an
    * alphabetic character, and ≥ 2 distinct stopwords present. The corpus
    * is clean by construction, so deterministic noise makes each rule
    * live: every 6th document gains 1-4 '#' symbol tokens, every 10th
    * gains three numeric tokens. Per-rule flags (not just the verdict)
    * are the production shape — filter-rate dashboards track WHICH rule
    * fires as the corpus mix shifts.
    *
    * Scale shape: pure per-row projection over token arrays — zero
    * shuffles before the declared ORDER BY; every ratio is one double
    * division of exact integers, r4-rounded, threshold-compared on the
    * rounded value in both engines. */
  def q143GopherRules(s: SparkSession, dir: String): DataFrame = {
    val noisy = concat(col("text"),
      when(col("doc_id") % 6 === 0,
        expr("repeat(' #', cast(doc_id % 4 + 1 as int))")).otherwise(lit("")),
      when(col("doc_id") % 10 === 0, lit(" 90210 90210 90210")).otherwise(lit("")))
    gopherRules(t(s, dir, "documents").select(col("doc_id"), noisy.as("page")))
  }

  /** Core of q143 over any (doc_id, page) frame — spec/library entry
    * point. */
  def gopherRules(docs: DataFrame): DataFrame = {
    val tk = split(col("page"), " ")
    val nWords = size(tk).cast("long")
    val sumLen = aggregate(transform(tk, w => length(w).cast("long")),
      lit(0L), (a, x) => a + x)
    val nSymbol = size(filter(tk, w => w === "#" || w === "...")).cast("long")
    val nAlpha = size(filter(tk, w => w.rlike("[a-z]"))).cast("long")
    val nStop = size(array_intersect(array_distinct(tk),
      array(Seq("the", "a", "to", "of", "and", "in", "on", "is").map(lit): _*)))
      .cast("long")
    val meanLen = graft.Stable.r4(sumLen.cast("double") / nWords.cast("double"))
    val symbolRatio = graft.Stable.r4(nSymbol.cast("double") / nWords.cast("double"))
    val alphaRatio = graft.Stable.r4(nAlpha.cast("double") / nWords.cast("double"))
    docs.select(col("doc_id"), nWords.as("n_words"), meanLen.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"), alphaRatio.as("alpha_ratio"),
        nStop.as("n_stopwords"))
      .withColumn("f_words", col("n_words").between(50L, 100000L).cast("int"))
      .withColumn("f_mean_len", col("mean_word_len").between(3.0, 10.0).cast("int"))
      .withColumn("f_symbol", (col("symbol_ratio") <= 0.1).cast("int"))
      .withColumn("f_alpha", (col("alpha_ratio") >= 0.8).cast("int"))
      .withColumn("f_stop", (col("n_stopwords") >= 2L).cast("int"))
      .withColumn("keep", (col("f_words") === 1 && col("f_mean_len") === 1
        && col("f_symbol") === 1 && col("f_alpha") === 1
        && col("f_stop") === 1).cast("int"))
      .orderBy("doc_id")
  }

  val q143Oracle: String =
    """WITH pg AS (SELECT doc_id,
           text
           || CASE WHEN doc_id % 6 = 0
                   THEN repeat(' #', CAST(doc_id % 4 + 1 AS INT)) ELSE '' END
           || CASE WHEN doc_id % 10 = 0 THEN ' 90210 90210 90210' ELSE '' END
             AS page
         FROM documents),
       m AS (SELECT doc_id, string_split(page, ' ') AS tk FROM pg),
       sig AS (SELECT doc_id,
           CAST(len(tk) AS BIGINT) AS n_words,
           CAST(list_aggregate(list_transform(tk, w -> length(w)), 'sum') AS BIGINT) AS sum_len,
           CAST(len(list_filter(tk, w -> w = '#' OR w = '...')) AS BIGINT) AS n_symbol,
           CAST(len(list_filter(tk, w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS n_alpha,
           CAST(len(list_intersect(list_distinct(tk),
             ['the','a','to','of','and','in','on','is'])) AS BIGINT) AS n_stop
         FROM m),
       r AS (SELECT doc_id, n_words,
           floor((CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS mean_word_len,
           floor((CAST(n_symbol AS DOUBLE) / CAST(n_words AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS symbol_ratio,
           floor((CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS alpha_ratio,
           n_stop AS n_stopwords
         FROM sig)
       SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_ratio, n_stopwords,
         CAST(n_words BETWEEN 50 AND 100000 AS INT) AS f_words,
         CAST(mean_word_len BETWEEN 3.0 AND 10.0 AS INT) AS f_mean_len,
         CAST(symbol_ratio <= 0.1 AS INT) AS f_symbol,
         CAST(alpha_ratio >= 0.8 AS INT) AS f_alpha,
         CAST(n_stopwords >= 2 AS INT) AS f_stop,
         CAST((n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
           AND symbol_ratio <= 0.1 AND alpha_ratio >= 0.8 AND n_stopwords >= 2 AS INT) AS keep
       FROM r ORDER BY doc_id"""

  // ---- q144: encoding (mojibake) repair -------------------------------------

  private val corruptUdf = udf((s: String, rounds: Int) =>
    graft.text.Mojibake.corruptN(s, rounds))
  private val repairUdf = udf((s: String) => graft.text.Mojibake.repair(s))

  /** The ftfy pass: accent two common corpus words (so non-ASCII exists to
    * corrupt), stack the deterministic wire corruption — every 3rd
    * document UTF-8-read-as-Latin-1 once, every 9th TWICE (nested
    * mojibake, the case naive fixers miss) — then run
    * [[graft.text.Mojibake.repair]] and prove the repaired text
    * hash-matches the NEVER-CORRUPTED original (the oracle only ever sees
    * the healthy accented text; any repair imperfection on any document
    * fails the corpus hash). `rounds_detected` is derived by the kernel
    * from the text alone — the oracle recomputes it from the corruption
    * schedule, so detection must agree with ground truth on every row,
    * including ASCII-only documents where corruption is the identity and
    * the correct answer is 0.
    *
    * Scale shape: zero-shuffle per-row kernel projection (the UDF is the
    * documented SQL-inexpressible-kernel exception — charset round-trips
    * have no Catalyst form); embarrassingly parallel at any corpus size. */
  def q144MojibakeRepair(s: SparkSession, dir: String): DataFrame = {
    val accented = regexp_replace(
      regexp_replace(col("text"), "\\btable\\b", "tabl\u00e9"),
      "\\bvalue\\b", "v\u00e4lue")
    val corruptionRounds = when(col("doc_id") % 9 === 0, 2)
      .when(col("doc_id") % 3 === 0, 1).otherwise(0)
    val rep = repairUdf(corruptUdf(accented, corruptionRounds))
    t(s, dir, "documents")
      .select(col("doc_id"), rep.as("rep"))
      .select(col("doc_id"),
        md5(col("rep._1")).as("repaired_hash"),
        col("rep._2").cast("long").as("rounds_detected"),
        (col("rep._2") > 0).cast("int").as("was_mojibake"))
      .orderBy("doc_id")
  }

  val q144Oracle: String =
    """WITH a AS (SELECT doc_id, text,
           regexp_replace(regexp_replace(text,
             '\btable\b', 'tabl' || chr(233), 'g'),
             '\bvalue\b', 'v' || chr(228) || 'lue', 'g') AS t
         FROM documents)
       SELECT doc_id, md5(t) AS repaired_hash,
         CAST(CASE WHEN t <> text AND doc_id % 9 = 0 THEN 2
                   WHEN t <> text AND doc_id % 3 = 0 THEN 1
                   ELSE 0 END AS BIGINT) AS rounds_detected,
         CAST(t <> text AND doc_id % 3 = 0 AS INT) AS was_mojibake
       FROM a ORDER BY doc_id"""

  // ---- q145: snapshot content diff ------------------------------------------

  /** Incremental-crawl planning: itemize every document ADDED, REMOVED or
    * CHANGED between snapshot A (the corpus) and snapshot B (the next
    * crawl: every 13th document gone, every remaining 7th revised, one new
    * document per 17th — deterministic, so the diff is oracle-checkable).
    * q141 alarms on DISTRIBUTION drift; this query names the rows, which
    * is what the recrawl scheduler and the incremental-dedup seed (q85)
    * actually consume.
    *
    * Scale shape: both sides project to (doc_id, source, content-hash)
    * before the ONE full-outer doc-keyed exchange — the scan never ships
    * text into the shuffle (column-pruned to the hash), unchanged rows
    * drop immediately after the join, and at 100 TB both snapshots are
    * already partitioned by doc key so the join co-locates. */
  def q145SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val a = docs.select(col("doc_id"), col("source").as("src_a"),
      md5(col("text")).as("ha"))
    val bCur = docs.where(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"), col("source").as("src_b"),
        md5(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" revision two")))
          .otherwise(col("text"))).as("hb"))
    val bNew = docs.where(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("source").as("src_b"),
        md5(concat(col("text"), lit(" fresh page"))).as("hb"))
    a.join(bCur.unionByName(bNew), Seq("doc_id"), "full_outer")
      .select(col("doc_id"), coalesce(col("src_a"), col("src_b")).as("source"),
        when(col("hb").isNull, "removed")
          .when(col("ha").isNull, "added")
          .when(col("ha") =!= col("hb"), "changed").as("status"))
      .where(col("status").isNotNull)
      .orderBy("doc_id")
  }

  val q145Oracle: String =
    """WITH a AS (SELECT doc_id, source, md5(text) AS ha FROM documents),
       bcur AS (SELECT doc_id, source,
           md5(CASE WHEN doc_id % 7 = 0 THEN text || ' revision two' ELSE text END) AS hb
         FROM documents WHERE doc_id % 13 <> 0),
       bnew AS (SELECT doc_id + 1000000 AS doc_id, source,
           md5(text || ' fresh page') AS hb
         FROM documents WHERE doc_id % 17 = 0),
       b AS (SELECT * FROM bcur UNION ALL SELECT * FROM bnew),
       j AS (SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
               COALESCE(a.source, b.source) AS source,
               CASE WHEN b.hb IS NULL THEN 'removed'
                    WHEN a.ha IS NULL THEN 'added'
                    WHEN a.ha <> b.hb THEN 'changed' END AS status
             FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
       SELECT doc_id, source, status FROM j
       WHERE status IS NOT NULL ORDER BY doc_id"""

  // ---- q146: quality-classifier calibration bins ----------------------------

  /** Eval-ops for the model-based quality filters (q39's learned scorer,
    * FineWeb-style classifiers): the RELIABILITY TABLE — bucket documents
    * by predicted quality decile and compare mean prediction against the
    * observed positive rate per bucket, the standard calibration check
    * before a classifier's threshold is trusted to gate a corpus. The
    * probe is a fixed deterministic linear scorer (weights w_j =
    * ((j mod 7) − 3)/10 over the embedding, sigmoid link) so both engines
    * derive identical predictions with no fitted state; labels binarize
    * as label mod 2.
    *
    * Exactness contract: the dot product folds in index order over the
    * same doubles in both engines (q107's proven recipe); the sigmoid is
    * the row's only transcendental (q110 precedent). Per-row predictions
    * micro-round to 1e-6 BIGINTs BEFORE the bucket sum, so the per-bucket
    * mean is an order-free integer sum with ONE final division (q117's
    * recipe); bucket counts and positive counts are exact integers.
    *
    * Scale shape: one aggregate shuffle over ≤10 bucket keys (map-side
    * combine does the work); the scan is a pure projection. At extreme
    * corpus sizes the 1e-6 units sum into DECIMAL(38) instead of BIGINT —
    * same recipe as q141's band products. */
  def q146CalibrationBins(s: SparkSession, dir: String): DataFrame = {
    val w = transform(sequence(lit(0), lit(63)),
      j => ((j % 7) - lit(3)).cast("double") / lit(10.0))
    val score = graft.ops.Similarity.dot(col("embedding").cast("array<double>"), w)
    val pred = lit(1.0) / (lit(1.0) + exp(-score))
    t(s, dir, "embeddings")
      .select(col("vec_id"), (col("label") % 2).cast("long").as("y"), pred.as("pred"))
      .withColumn("bucket", least(floor(col("pred") * 10).cast("long"), lit(9L)))
      .withColumn("pred_u", floor(col("pred") * 1e6 + 0.5).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("y")).cast("long").as("n_pos"),
        sum(col("pred_u")).as("su"))
      .select(col("bucket"), col("n"), col("n_pos"),
        graft.Stable.r4(col("su").cast("double") / col("n").cast("double") / 1e6)
          .as("mean_pred"),
        graft.Stable.r4(col("n_pos").cast("double") / col("n").cast("double"))
          .as("pos_rate"))
      .withColumn("gap", graft.Stable.r4(abs(col("mean_pred") - col("pos_rate"))))
      .orderBy("bucket")
  }

  val q146Oracle: String =
    """WITH e AS (SELECT vec_id, CAST(label % 2 AS BIGINT) AS y,
           embedding::DOUBLE[] AS v FROM embeddings),
       sc AS (SELECT vec_id, y,
           1.0 / (1.0 + exp(-list_inner_product(v,
             list_transform(generate_series(0, 63),
               j -> CAST((j % 7) - 3 AS DOUBLE) / 10.0)))) AS pred
         FROM e),
       b AS (SELECT LEAST(CAST(floor(pred * 10) AS BIGINT), 9) AS bucket, y,
               CAST(floor(pred * 1000000.0 + 0.5) AS BIGINT) AS pred_u
             FROM sc),
       g AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos, SUM(pred_u) AS su
             FROM b GROUP BY bucket),
       r AS (SELECT bucket, n, n_pos,
               floor((CAST(su AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0)
                 * 10000.0 + 0.5) / 10000.0 AS mean_pred,
               floor((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
                 * 10000.0 + 0.5) / 10000.0 AS pos_rate
             FROM g)
       SELECT bucket, n, n_pos, mean_pred, pos_rate,
         floor(abs(mean_pred - pos_rate) * 10000.0 + 0.5) / 10000.0 AS gap
       FROM r ORDER BY bucket"""

  // ---- q147: source coverage curve + blocklist ------------------------------

  /** The corpus-concentration dashboard: drop blocklisted sources
    * (broadcast anti-join — the domain-blocklist filter every crawl
    * pipeline runs), then rank surviving sources by token mass and
    * report each one's cumulative corpus share — "how many domains cover
    * half the corpus" is the concentration alarm next to q141's drift
    * alarm. `covers_half` flags the prefix that first reaches 50% via an
    * EXACT integer comparison (2·cum ≥ total), so the flag never hangs
    * on a rounded double.
    *
    * Scale shape: one (source) aggregate over the corpus (map-side
    * combine), then rank/cumsum windows over the |sources|-bounded
    * rollup — the global window is fine precisely because its input is
    * catalog-sized, never the corpus (contrast q134's note); the 1-row
    * total broadcasts back. Blocklist is a literal-frame broadcast
    * anti-join: at production scale the blocklist stays ≪ executor
    * memory and the probe is map-side. */
  def q147SourceCoverage(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val blocked = s.createDataFrame(Seq(Tuple1("src3"), Tuple1("src7"), Tuple1("src13")))
      .toDF("source")
    val bySrc = t(s, dir, "documents")
      .join(broadcast(blocked), Seq("source"), "left_anti")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val total = bySrc.agg(sum(col("n_tokens")).as("t"))
    val w = Window.orderBy(col("n_tokens").desc, col("source"))
    bySrc
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("source"), col("n_docs"), col("n_tokens"),
        col("cum_tokens"),
        graft.Stable.r4(col("cum_tokens").cast("double") / col("t").cast("double"))
          .as("cum_share"),
        (col("cum_tokens") * 2 >= col("t")).cast("int").as("covers_half"))
      .orderBy("rank")
  }

  val q147Oracle: String =
    """WITH kept AS (SELECT source, text FROM documents
                     WHERE source NOT IN ('src3', 'src7', 'src13')),
       bysrc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
                 FROM kept GROUP BY source),
       ranked AS (SELECT source, n_docs, n_tokens,
                    CAST(ROW_NUMBER() OVER (ORDER BY n_tokens DESC, source)
                      AS BIGINT) AS rank,
                    CAST(SUM(n_tokens) OVER (ORDER BY n_tokens DESC, source
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum_tokens
                  FROM bysrc),
       tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM bysrc)
       SELECT rank, source, n_docs, n_tokens, cum_tokens,
         floor((CAST(cum_tokens AS DOUBLE) / CAST(t AS DOUBLE))
           * 10000.0 + 0.5) / 10000.0 AS cum_share,
         CAST(cum_tokens * 2 >= t AS INT) AS covers_half
       FROM ranked, tot ORDER BY rank"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q142_line_dedup" -> (q142LineDedup _),
    "q143_gopher_rules" -> (q143GopherRules _),
    "q144_mojibake_repair" -> (q144MojibakeRepair _),
    "q145_snapshot_diff" -> (q145SnapshotDiff _),
    "q146_calibration_bins" -> (q146CalibrationBins _),
    "q147_source_coverage" -> (q147SourceCoverage _))

  val oracles: Map[String, String] = Map(
    "q142_line_dedup" -> q142Oracle,
    "q143_gopher_rules" -> q143Oracle,
    "q144_mojibake_repair" -> q144Oracle,
    "q145_snapshot_diff" -> q145Oracle,
    "q146_calibration_bins" -> q146Oracle,
    "q147_source_coverage" -> q147Oracle)
}
