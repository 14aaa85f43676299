package graft.rel

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The SQL front door: every test table registers as a temp view and a
  * representative slice of the declared queries re-runs through
  * `spark.sql(...)`, asserted row-for-row equal to its DataFrame twin.
  * This pins (a) that a SQL-first user of the engine can express the
  * declared surface through the parser, and (b) that the committed
  * oracle SQL is genuinely ANSI where claimed — most twins below ARE the
  * DuckDB oracle strings, run verbatim by Spark's parser.
  *
  * Comparison is on sorted row multisets (not result order): Spark sorts
  * NULLS FIRST and DuckDB NULLS LAST by default, and the twins must not
  * have to care. Values still compare bit-exactly — both sides execute in
  * the same engine.
  */
object SqlFrontDoorSpec {
  /** Oracle strings that are pure ANSI and run verbatim through spark.sql
    * — the strongest possible portability claim for the committed oracles
    * (every name here is asserted below; [[SqlFrontDoorWideSpec]] builds
    * its full-catalog coverage ledger from this list). */
  val verbatim: Seq[String] = Seq(
    "q01_scan_filter_project",
    "q03_join_5way",
    "q04_semi_anti",
    "q05_outer_join_agg",
    "q08_distinct_agg",
    "q10_rollup",
    "q11_window_rank",
    "q12_window_frame",
    "q13_topk",
    "q14_set_ops",
    "q21_dedup_exact",
    "q43_cube",
    "q47_grouping_sets",
    "q48_pivot",
    "q51_conditional_agg",
    "q54_correlated_subquery",
    "q66_salted_agg",
    "q69_orc_roundtrip",
    "q70_unpivot",
    "q78_lateral_topn",
    "q83_stratified_sample",
    "q85_incremental_dedup",
    "q88_partitioned_prune",
    "q92_gzip_jsonl",
    "q93_url_parse", // oracle uses the STRING type alias both dialects accept
    "q98_xml_roundtrip",
    "q101_zorder_layout", // bitwise >>/& and NTILE parse identically in both
    "q134_interleave_order", // pure ANSI windows; % is modulo in both dialects
    "q145_snapshot_diff", // md5/CASE/FULL OUTER/UNION ALL/|| parse identically
    "q160_schema_evolution", // COUNT(CASE)/DECIMAL casts parse identically
    "q163_triangle_count", // LEAST/GREATEST/EXISTS/UNION ALL parse identically
  )

  /** Queries with a hand-adapted twin asserted IN THIS SUITE (each test
    * below documents its dialect adaptation). [[SqlFrontDoorWideSpec]]'s
    * ledger test consumes this list: together with `verbatim`, its
    * mechanically-adapted set, and its named gaps, every committed
    * oracle must be classified exactly once. */
  val adaptedHere: Seq[String] = Seq(
    "q02_pricing_summary", "q97_heavy_hitters", "q07_asof_latest_order",
    "q99_binaryfile_source", "q100_repetition_signals", "q103_passage_chunks",
    "q104_bm25", "q105_pagerank", "q106_label_centroids",
    "q108_merge_upsert", "q109_median_filter",
    "q122_dup_spans", "q123_bigram_lm", "q124_kmeans",
    "q126_weighted_jaccard", "q129_dedup_span_rewrite",
    "q130_source_overlap", "q140_cluster_balance")
}

class SqlFrontDoorSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def registerViews(): Unit =
    Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation", "region", "events", "documents", "embeddings")
      .foreach(n => Tables.load(spark, dir, n).createOrReplaceTempView(n))

  /** Sorted multiset of rows, null-order-insensitive. */
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString(""))

  private def checkTwin(name: String, sql: String): Unit = {
    registerViews()
    val viaSql = spark.sql(sql)
    val viaDf = graft.SparkEntry.queries(name)(spark, dir)
    assert(viaSql.columns.toSeq == viaDf.columns.toSeq,
      s"$name: SQL twin columns ${viaSql.columns.toSeq} != DataFrame ${viaDf.columns.toSeq}")
    val a = canon(viaSql); val b = canon(viaDf)
    assert(a == b, s"$name: SQL twin diverges from DataFrame result " +
      s"(${a.size} vs ${b.size} rows; first diff: " +
      s"${a.zip(b).find { case (x, y) => x != y }.orElse(Some((a.headOption, b.headOption)))})")
  }

  SqlFrontDoorSpec.verbatim.foreach { name =>
    test(s"$name: the committed oracle SQL runs through spark.sql and matches the DataFrame twin") {
      checkTwin(name, graft.SparkEntry.oracleSql(name))
    }
  }

  // q02's oracle leans on DuckDB's floor(double) -> double; Spark's floor
  // returns BIGINT, whose division by a decimal literal re-types the
  // column. The front-door spelling pins the avg columns to DOUBLE
  // explicitly — the one dialect adaptation a SQL user would make.
  test("q02_pricing_summary: Spark-SQL twin (explicit DOUBLE avgs) matches the DataFrame twin") {
    checkTwin("q02_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
         CAST(floor((CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS avg_qty,
         CAST(floor((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS avg_price,
         CAST(floor((CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS avg_disc,
         COUNT(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '2000-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""")
  }

  // Token explosion: DuckDB spells it unnest(string_split(...)); Spark
  // spells the same relation explode(split(...)) — the canonical rewrite.
  test("q97_heavy_hitters: Spark-SQL explode twin matches the DataFrame twin") {
    checkTwin("q97_heavy_hitters",
      """SELECT tk, COUNT(*) AS freq
         FROM (SELECT explode(split(text, ' ')) AS tk FROM documents)
         GROUP BY tk HAVING COUNT(*) >= 200
         ORDER BY freq DESC, tk""")
  }

  // The as-of query: DuckDB spells it QUALIFY; Spark spells the same
  // plan as a windowed subquery — the canonical front-door rewrite.
  test("q07_asof_latest_order: Spark-SQL windowed-subquery twin matches the DataFrame twin") {
    checkTwin("q07_asof_latest_order",
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS asof_date, o_totalprice
         FROM (
           SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                  ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders
           WHERE o_orderdate <= TIMESTAMP '1998-01-01') t
         WHERE rn = 1
         ORDER BY o_custkey""")
  }

  // q99's oracle measures UTF-8 bytes as DuckDB strlen; Spark spells the
  // same byte count octet_length. (The SQL twin reads the source table
  // directly — the digest/length identity is exactly what the binaryFile
  // round-trip preserves, so the results coincide row-for-row.)
  test("q99_binaryfile_source: Spark-SQL octet_length twin matches the DataFrame twin") {
    checkTwin("q99_binaryfile_source",
      """SELECT doc_id, CAST(octet_length(text) AS BIGINT) AS byte_len,
                md5(text) AS digest
         FROM documents WHERE doc_id < 500 ORDER BY doc_id""")
  }

  // q100's oracle builds grams with DuckDB's generate_series/unnest; the
  // Spark spelling uses the same slice+transform lambda the DataFrame
  // twin uses — higher-order array functions through the parser.
  test("q100_repetition_signals: Spark-SQL higher-order-function twin matches the DataFrame twin") {
    checkTwin("q100_repetition_signals",
      """WITH toks AS (SELECT doc_id, split(text, ' ') AS t FROM documents),
         g2 AS (SELECT doc_id, explode(transform(slice(t, 1, greatest(size(t)-1, 0)),
                  (w, i) -> concat(w, ' ', t[i+1]))) AS g FROM toks),
         g3 AS (SELECT doc_id, explode(transform(slice(t, 1, greatest(size(t)-2, 0)),
                  (w, i) -> concat(w, ' ', t[i+1], ' ', t[i+2]))) AS g FROM toks),
         c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
         a2 AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS tot FROM c2 GROUP BY 1),
         c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2),
         a3 AS (SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup,
                       SUM(c) AS tot FROM c3 GROUP BY 1)
         SELECT d.doc_id, CAST(size(split(d.text, ' ')) AS BIGINT) AS n_tokens,
           floor(COALESCE(CAST(a2.mx AS DOUBLE) / NULLIF(a2.tot, 0), 0.0) * 1e4 + 5e-1) / 1e4 AS top2_frac,
           floor(COALESCE(CAST(a3.dup AS DOUBLE) / NULLIF(a3.tot, 0), 0.0) * 1e4 + 5e-1) / 1e4 AS dup3_frac,
           (floor(COALESCE(CAST(a2.mx AS DOUBLE) / NULLIF(a2.tot, 0), 0.0) * 1e4 + 5e-1) / 1e4 <= 5e-2
            AND floor(COALESCE(CAST(a3.dup AS DOUBLE) / NULLIF(a3.tot, 0), 0.0) * 1e4 + 5e-1) / 1e4 <= 1e-1) AS keep
         FROM documents d
         LEFT JOIN a2 ON d.doc_id = a2.doc_id
         LEFT JOIN a3 ON d.doc_id = a3.doc_id
         ORDER BY d.doc_id""")
  }

  // q103's oracle slices DuckDB lists with t[a:b]; Spark spells the same
  // window slice(t, start, len) inside a transform lambda.
  test("q103_passage_chunks: Spark-SQL slice/transform twin matches the DataFrame twin") {
    checkTwin("q103_passage_chunks",
      """WITH toks AS (SELECT doc_id, split(text, ' ') AS t FROM documents),
         p AS (SELECT doc_id, pp.p_idx AS p_idx, pp.p AS p
               FROM (SELECT doc_id, explode(transform(sequence(0, (size(t)-1) div 24),
                       k -> struct(k AS p_idx, slice(t, k*24+1, 32) AS p))) AS pp
                     FROM toks))
         SELECT doc_id, CAST(p_idx AS BIGINT) AS p_idx,
                CAST(p_idx * 24 AS BIGINT) AS start_tok,
                CAST(size(p) AS BIGINT) AS n_tok,
                array_join(p, ' ') AS p_text
         FROM p ORDER BY doc_id, p_idx""")
  }

  // q104's oracle is near-ANSI; the Spark spelling renames the three
  // DuckDB-isms (string_split/unnest/len) and types the r4 literals as
  // DOUBLE via scientific notation (Spark parses 10000.0 as DECIMAL).
  test("q104_bm25: Spark-SQL twin matches the DataFrame twin") {
    checkTwin("q104_bm25",
      """WITH toks AS (SELECT doc_id, split(text, ' ') AS t FROM documents),
         dl AS (SELECT doc_id, CAST(size(t) AS DOUBLE) AS dl FROM toks),
         stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
         tf AS (SELECT doc_id, tk, CAST(COUNT(*) AS DOUBLE) AS tf
                FROM (SELECT doc_id, explode(t) AS tk FROM toks)
                WHERE tk IN ('spark', 'join', 'merge') GROUP BY 1, 2),
         df AS (SELECT tk, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY 1),
         scored AS (
           SELECT tf.doc_id,
             SUM( ln((s.n_docs - df.df + 5e-1) / (df.df + 5e-1) + 1e0)
                  * tf.tf * 2.2e0 / (tf.tf + 1.2e0 * (2.5e-1 + 7.5e-1 * dl.dl / s.avgdl)) ) AS score
           FROM tf JOIN df USING (tk) JOIN dl USING (doc_id) CROSS JOIN stats s
           GROUP BY 1)
         SELECT doc_id, floor(score * 1e4 + 5e-1) / 1e4 AS bm25
         FROM scored ORDER BY bm25 DESC, doc_id LIMIT 20""")
  }

  // q105's oracle is the unrolled-CTE power iteration; the Spark spelling
  // only renames epoch_ms -> unix_millis (scalar subqueries, lead windows
  // and the iteration algebra parse identically).
  test("q105_pagerank: Spark-SQL unrolled-CTE twin matches the DataFrame twin") {
    checkTwin("q105_pagerank",
      graft.rel.CurationQueries.q105Oracle.replace("epoch_ms(ts)", "unix_millis(ts)"))
  }

  // q106's oracle indexes DuckDB lists via generate_series; Spark spells
  // the same relation with posexplode (1-based via pos+1).
  test("q106_label_centroids: Spark-SQL posexplode twin matches the DataFrame twin") {
    checkTwin("q106_label_centroids",
      """WITH x AS (SELECT CAST(label AS BIGINT) AS label, posexplode(CAST(embedding AS ARRAY<DOUBLE>)) AS (pos0, val)
                    FROM embeddings)
         SELECT label, CAST(pos0 + 1 AS BIGINT) AS pos,
           floor(AVG(val) * 1e4 + 5e-1) / 1e4 AS c, COUNT(*) AS n
         FROM x GROUP BY 1, 2 ORDER BY 1, 2""")
  }

  // q108's oracle is ANSI except DuckDB strlen; Spark spells the byte
  // count octet_length (the q99 adaptation).
  test("q108_merge_upsert: Spark-SQL full-outer-join twin matches the DataFrame twin") {
    checkTwin("q108_merge_upsert",
      graft.SparkEntry.oracleSql("q108_merge_upsert")
        .replace("strlen(", "octet_length("))
  }

  // q109's oracle is ANSI except len(string_split(...)) and DuckDB's //
  // integer division; Spark spells them size(split(...)) and div.
  test("q109_median_filter: Spark-SQL windowed-median twin matches the DataFrame twin") {
    checkTwin("q109_median_filter",
      graft.SparkEntry.oracleSql("q109_median_filter")
        .replace("len(string_split(text, ' '))", "size(split(text, ' '))")
        .replace("(cnt + 1) // 2", "(cnt + 1) div 2"))
  }

  // q122's oracle builds stride-1 windows with DuckDB's lateral
  // generate_series + list slice t[a:b]; Spark spells the same windows
  // with the q103 transform+slice lambda. Everything downstream (window
  // counts, LEAD coverage sweep) parses identically.
  test("q122_dup_spans: Spark-SQL slice/transform twin matches the DataFrame twin") {
    checkTwin("q122_dup_spans",
      """WITH toks AS (SELECT doc_id, split(text, ' ') AS t,
                              size(split(text, ' ')) AS n FROM documents),
         w AS (SELECT doc_id, ww.k AS k, ww.wt AS wt
               FROM (SELECT doc_id, explode(transform(sequence(0, n - 16),
                       k -> struct(k AS k, array_join(slice(t, k + 1, 16), ' ') AS wt))) AS ww
                     FROM toks WHERE n >= 16)),
         f AS (SELECT doc_id, k, COUNT(*) OVER (PARTITION BY wt) AS f FROM w),
         d AS (SELECT doc_id, k,
                 LEAD(k) OVER (PARTITION BY doc_id ORDER BY k) AS nk
               FROM f WHERE f > 1),
         cov AS (SELECT doc_id, COUNT(*) AS n_dup_windows,
                   SUM(CASE WHEN nk IS NULL THEN 16
                            ELSE LEAST(16, nk - k) END) AS dup_tokens
                 FROM d GROUP BY doc_id)
         SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
           CAST(t.n AS BIGINT) AS n_tokens,
           CAST(COALESCE(c.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
           CAST(COALESCE(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           floor(CAST(COALESCE(c.dup_tokens, 0) AS DOUBLE)
                 / CAST(t.n AS DOUBLE) * 1e4 + 5e-1) / 1e4 AS dup_frac
         FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id ORDER BY doc_id""")
  }

  // q123's oracle zips adjacent tokens via lateral generate_series with
  // 1-based t[i+1]/t[i+2]; Spark spells the bigram expansion as a
  // transform lambda over 0-based t[i]/t[i+1] (the DataFrame kernel).
  // DOUBLE-typed literals spelled 7e-1/3e-1/1e6 (Spark parses 0.7 as
  // DECIMAL); the DECIMAL(18,6) nll cast and sums parse identically.
  test("q123_bigram_lm: Spark-SQL transform-lambda twin matches the DataFrame twin") {
    checkTwin("q123_bigram_lm",
      """WITH toks AS (SELECT doc_id, lang, split(text, ' ') AS t,
                              size(split(text, ' ')) AS n FROM documents),
         bi AS (SELECT doc_id, lang, bb.w1 AS w1, bb.w2 AS w2
                FROM (SELECT doc_id, lang, explode(transform(sequence(0, n - 2),
                        i -> struct(t[i] AS w1, t[i + 1] AS w2))) AS bb
                      FROM toks WHERE n >= 2)),
         c12 AS (SELECT lang, w1, w2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2, 3),
         c1 AS (SELECT lang, w1, SUM(c12) AS c1 FROM c12 GROUP BY 1, 2),
         c2 AS (SELECT lang, w2, SUM(c12) AS c2 FROM c12 GROUP BY 1, 2),
         tot AS (SELECT lang, SUM(c12) AS tot FROM c12 GROUP BY 1),
         nll AS (
           SELECT bi.doc_id, bi.lang,
             CAST(floor(-ln(
                 7e-1 * (CAST(c12.c12 AS DOUBLE) / CAST(c1.c1 AS DOUBLE))
               + 3e-1 * (CAST(c2.c2 AS DOUBLE) / CAST(tot.tot AS DOUBLE)))
               * 1e6 + 5e-1) / 1e6 AS DECIMAL(18,6)) AS nll
           FROM bi
           JOIN c12 ON bi.lang = c12.lang AND bi.w1 = c12.w1 AND bi.w2 = c12.w2
           JOIN c1 ON bi.lang = c1.lang AND bi.w1 = c1.w1
           JOIN c2 ON bi.lang = c2.lang AND bi.w2 = c2.w2
           JOIN tot ON bi.lang = tot.lang)
         SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           floor(CAST(SUM(nll) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                 * 1e4 + 5e-1) / 1e4 AS xent2
         FROM nll GROUP BY doc_id, lang ORDER BY doc_id""")
  }

  // q126's oracle builds 3-gram shingles via lateral generate_series +
  // t[a:b] list slices; Spark spells them transform+slice (the q122
  // adaptation). The scalar (SELECT nn FROM nd) subquery, integer idf
  // weights and inclusion–exclusion algebra parse identically.
  test("q126_weighted_jaccard: Spark-SQL slice/transform twin matches the DataFrame twin") {
    checkTwin("q126_weighted_jaccard",
      """WITH toks AS (SELECT doc_id, split(text, ' ') AS t,
                              size(split(text, ' ')) AS n FROM documents),
         sh AS (SELECT DISTINCT doc_id, s
                FROM (SELECT doc_id, explode(transform(sequence(0, n - 3),
                        k -> array_join(slice(t, k + 1, 3), ' '))) AS s
                      FROM toks WHERE n >= 3)),
         nd AS (SELECT COUNT(DISTINCT doc_id) AS nn FROM sh),
         df AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY 1),
         w AS (SELECT s,
                 CAST(floor(ln(CAST((SELECT nn FROM nd) + 1 AS DOUBLE)
                               / CAST(df + 1 AS DOUBLE))
                   * 1e6 + 5e-1) AS BIGINT) AS iw
               FROM df),
         shw AS (SELECT sh.doc_id, sh.s, w.iw
                 FROM sh JOIN w USING (s) WHERE w.iw > 0),
         tw AS (SELECT doc_id, SUM(iw) AS tw FROM shw GROUP BY 1),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, SUM(a.iw) AS iw
                   FROM shw a JOIN shw b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
         SELECT d1, d2, floor(jw * 1e4 + 5e-1) / 1e4 AS jw
         FROM (SELECT i.d1, i.d2,
                 CAST(i.iw AS DOUBLE) / CAST(t1.tw + t2.tw - i.iw AS DOUBLE) AS jw
               FROM inter i
               JOIN tw t1 ON i.d1 = t1.doc_id
               JOIN tw t2 ON i.d2 = t2.doc_id)
         WHERE jw >= 3e-1 ORDER BY d1, d2""")
  }

  // q129's oracle re-assembles clean text with string_agg(... ORDER BY);
  // Spark spells the same order-preserving concatenation
  // array_join(transform(array_sort(collect_list(struct(pos, tok))))) —
  // the shuffle-safe DataFrame idiom, through the parser. Windows and
  // the covered-position expansion adapt as in q122 (transform/sequence).
  test("q129_dedup_span_rewrite: Spark-SQL ordered-reassembly twin matches the DataFrame twin") {
    checkTwin("q129_dedup_span_rewrite",
      """WITH toks AS (SELECT doc_id, split(text, ' ') AS t,
                              size(split(text, ' ')) AS n FROM documents),
         w AS (SELECT doc_id, ww.k AS k, ww.wt AS wt
               FROM (SELECT doc_id, explode(transform(sequence(0, n - 16),
                       k -> struct(k AS k, array_join(slice(t, k + 1, 16), ' ') AS wt))) AS ww
                     FROM toks WHERE n >= 16)),
         f AS (SELECT doc_id, k, COUNT(*) OVER (PARTITION BY wt) AS f FROM w),
         covered AS (SELECT DISTINCT doc_id, pos
                     FROM (SELECT doc_id, explode(sequence(k, k + 15)) AS pos
                           FROM f WHERE f > 1)),
         tokpos AS (SELECT doc_id, pos, tok
                    FROM (SELECT doc_id, posexplode(t) AS (pos, tok) FROM toks)),
         kept AS (SELECT tp.doc_id, COUNT(*) AS n_kept,
                    array_join(transform(array_sort(collect_list(struct(tp.pos, tp.tok))),
                      s -> s.tok), ' ') AS clean_text
                  FROM tokpos tp
                  LEFT ANTI JOIN covered c
                    ON tp.doc_id = c.doc_id AND tp.pos = c.pos
                  GROUP BY tp.doc_id)
         SELECT t.doc_id, CAST(t.n AS BIGINT) AS n_tokens,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           COALESCE(k.clean_text, '') AS clean_text
         FROM toks t LEFT JOIN kept k ON t.doc_id = k.doc_id
         ORDER BY t.doc_id""")
  }

  // q130's oracle builds 8-gram shingles like q126 builds 3-grams; the
  // same transform+slice adaptation applies and the pair algebra parses
  // identically.
  test("q130_source_overlap: Spark-SQL slice/transform twin matches the DataFrame twin") {
    checkTwin("q130_source_overlap",
      """WITH toks AS (SELECT source, split(text, ' ') AS t,
                              size(split(text, ' ')) AS n FROM documents),
         sh AS (SELECT DISTINCT source, sg
                FROM (SELECT source, explode(transform(sequence(0, n - 8),
                        k -> array_join(slice(t, k + 1, 8), ' '))) AS sg
                      FROM toks WHERE n >= 8)),
         sz AS (SELECT source, COUNT(*) AS nsh FROM sh GROUP BY 1),
         inter AS (SELECT a.source AS s1, b.source AS s2, COUNT(*) AS shared
                   FROM sh a JOIN sh b ON a.sg = b.sg AND a.source < b.source
                   GROUP BY 1, 2)
         SELECT i.s1, i.s2, CAST(i.shared AS BIGINT) AS shared,
           CAST(z1.nsh AS BIGINT) AS n1, CAST(z2.nsh AS BIGINT) AS n2,
           floor(CAST(i.shared AS DOUBLE)
                 / CAST(z1.nsh + z2.nsh - i.shared AS DOUBLE)
                 * 1e4 + 5e-1) / 1e4 AS overlap
         FROM inter i
         JOIN sz z1 ON i.s1 = z1.source
         JOIN sz z2 ON i.s2 = z2.source
         ORDER BY i.s1, i.s2""")
  }

  // q124's oracle indexes centroid/vector dims via lateral
  // generate_series + q[i]; Spark spells the dim expansion posexplode
  // (joining on the shared 0-based pos). The unrolled Lloyd algebra —
  // integer distance sums, ROW_NUMBER argmin, floor'd mean updates —
  // parses identically in both dialects. Shared by the q124 and q140
  // twins (q140's oracle splices q124's committed CTEs the same way).
  private val lloydCtes: String =
    """e AS (SELECT vec_id, transform(CAST(embedding AS ARRAY<DOUBLE>),
                      x -> CAST(floor(x * 1e6 + 5e-1) AS BIGINT)) AS q
                    FROM embeddings),
         x AS (SELECT vec_id, pos0 AS pos, v
               FROM (SELECT vec_id, posexplode(q) AS (pos0, v) FROM e)),
         c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cl, q
                FROM e ORDER BY vec_id LIMIT 8),
         c0x AS (SELECT cl, pos0 AS pos, v
                 FROM (SELECT cl, posexplode(q) AS (pos0, v) FROM c0)),
         d1 AS (SELECT x.vec_id, c.cl, SUM((x.v - c.v) * (x.v - c.v)) AS d2
                FROM x JOIN c0x c ON x.pos = c.pos GROUP BY x.vec_id, c.cl),
         a1 AS (SELECT vec_id, cl FROM (
                  SELECT vec_id, cl,
                    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
                  FROM d1) WHERE rn = 1),
         c1x AS (SELECT a.cl, x.pos,
                   CAST(floor(CAST(SUM(x.v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) + 5e-1) AS BIGINT) AS v
                 FROM a1 a JOIN x ON a.vec_id = x.vec_id GROUP BY a.cl, x.pos),
         d2_ AS (SELECT x.vec_id, c.cl, SUM((x.v - c.v) * (x.v - c.v)) AS d2
                 FROM x JOIN c1x c ON x.pos = c.pos GROUP BY x.vec_id, c.cl),
         a2 AS (SELECT vec_id, cl FROM (
                  SELECT vec_id, cl,
                    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
                  FROM d2_) WHERE rn = 1),
         c2x AS (SELECT a.cl, x.pos,
                   CAST(floor(CAST(SUM(x.v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) + 5e-1) AS BIGINT) AS v
                 FROM a2 a JOIN x ON a.vec_id = x.vec_id GROUP BY a.cl, x.pos),
         d3 AS (SELECT x.vec_id, c.cl, SUM((x.v - c.v) * (x.v - c.v)) AS d2
                FROM x JOIN c2x c ON x.pos = c.pos GROUP BY x.vec_id, c.cl)"""

  test("q124_kmeans: Spark-SQL unrolled-Lloyd twin matches the DataFrame twin") {
    checkTwin("q124_kmeans",
      s"""WITH $lloydCtes
         SELECT vec_id, CAST(cl AS BIGINT) AS cluster, CAST(d2 AS BIGINT) AS dist2
         FROM (SELECT vec_id, cl, d2,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
               FROM d3) WHERE rn = 1
         ORDER BY vec_id""")
  }

  // q140 stacks the balance/resample tail on the same Lloyd chain; the
  // only additional dialect moves are // → div and the lateral
  // generate_series copy expansion → LATERAL VIEW explode(sequence).
  test("q140_cluster_balance: Lloyd twin + balance tail matches the DataFrame twin") {
    checkTwin("q140_cluster_balance",
      s"""WITH $lloydCtes,
         asg AS (SELECT vec_id, CAST(cl AS BIGINT) AS cluster FROM (
                   SELECT vec_id, cl,
                     ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
                   FROM d3) WHERE rn = 1),
         cs AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
                FROM asg GROUP BY cluster),
         mx AS (SELECT MAX(cluster_size) AS m FROM cs),
         wt AS (SELECT cluster, cluster_size,
                  LEAST((m * 65536) div cluster_size, CAST(262144 AS BIGINT)) AS w
                FROM cs, mx),
         cop AS (SELECT a.vec_id, a.cluster, w.cluster_size,
                   w.w div 65536
                     + CASE WHEN (a.vec_id * 16807) % 65536 < w.w % 65536
                            THEN 1 ELSE 0 END AS n_copies
                 FROM asg a JOIN wt w ON a.cluster = w.cluster)
         SELECT vec_id, cluster, cluster_size,
                CAST(n_copies AS BIGINT) AS n_copies,
                CAST(copy_idx AS BIGINT) AS copy_idx
         FROM cop LATERAL VIEW explode(sequence(CAST(1 AS BIGINT), n_copies)) u AS copy_idx
         WHERE n_copies >= 1
         ORDER BY vec_id, copy_idx""")
  }
}
