package graft.rel

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth relational batch (round 6, second session): the remaining
  * corpus-curation / data-layout operators around the existing surface.
  *
  *   - q99  `binaryFile` source — the blob-store ingestion path every
  *          multimodal pipeline starts from (one object per document).
  *   - q100 Gopher-style repetition quality signals (top-2-gram coverage,
  *          duplicated-3-gram fraction) — the classic pre-training text
  *          filters from Rae et al. 2021 (Gopher, §A1.1) / C4.
  *   - q101 Z-order (Morton) multi-dimensional layout clustering — the
  *          write-time file-clustering trick that makes min/max skipping
  *          work on TWO predicates at once.
  *   - q102 SemDeDup-style embedding-cluster near-dedup (Abbas et al.
  *          2023): kmeans cells prune the pair space, exact cosine
  *          verifies candidates — the 100-TB scale path whose exact twin
  *          is q44.
  *   - q103 passage chunking with overlap (the RAG passage table).
  *   - q104 distributed Okapi BM25, fully oracle-checked.
  *   - q105 PageRank (iterative fixpoint #2 next to q81's CC).
  *   - q106/q107 embedding post-processing (label centroids; L2 +
  *          Matryoshka prefix energy).
  *   - q108 MERGE-style corpus upsert (incremental ingestion rewrite).
  *   - q109 per-group median-threshold adaptive filter.
  *   - q110 exponential time-decay engagement weighting.
  *   - q111 REAL RIFF/AVI container demux with a content oracle.
  *   - q112 REAL IMA ADPCM compressed-audio decode, bit-exact oracle.
  *   - q113 REAL 8.8 fixed-point bilinear resize, bit-exact oracle.
  *   - q114 length-bucketed batching / padding-waste accounting.
  *   - q116 PII redaction (email/phone detect + mask + audit digest).
  *   - q117 CCNet-style unigram-LM cross-entropy head/middle/tail
  *          quality buckets (per-language discrete terciles).
  *   - q118 deterministic mixture resampling (epochs-per-source up/down
  *          sampling with integer weights and a hash-bucket fraction).
  *   - q119 per-key top-k on the custom [[graft.plans.TopKPerKey]]
  *          operator, under the driver hash gate directly.
  *   - q120 deterministic mergeable histogram quantiles (the SKETCH-side
  *          order-exact recipe; q68's declared body is the exact
  *          binary-search selection since round 10).
  *   - q121 BPE tokenizer vocabulary induction (merge learning on the
  *          word-frequency table; fixture oracle).
  *
  * Oracle discipline as in [[Queries]] (BIGINT casts, Stable.r4 rounding,
  * deterministic ORDER BY over a unique key).
  */
object CurationQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** applicationId-scoped scratch dir (see ExtraQueries.sessionTmp). */
  private def sessionTmp(s: SparkSession, name: String, dir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      name + "_" + s.sparkContext.applicationId + "_" +
        dir.replaceAll("[^A-Za-z0-9._-]", "_")).toString

  // ---- q99: binaryFile source (per-object blob ingestion) -------------------

  /** Materialize one file per document (the one-object-per-asset layout a
    * blob store hands you), then ingest the directory with Spark's native
    * `binaryFile` source and recover (id, byte length, content digest)
    * per object. The write side is a partition-local fixture generator
    * (local-FS stand-in for the object store); the READ side is the
    * operator under test: binaryFile streams file contents as a `binary`
    * column with `pathGlobFilter` pruning at listing time, and
    * `maxPartitionBytes` packs small objects into tasks — the standard
    * multimodal ingestion front door at any corpus size.
    *
    * Oracle: length and md5 digest recomputed from the source table's
    * UTF-8 text (DuckDB strlen/md5 are byte-wise over UTF-8, matching the
    * file bytes exactly).
    */
  def q99BinaryfileSource(s: SparkSession, dir: String): DataFrame = {
    val tmp = sessionTmp(s, "graft_binfiles", dir)
    new java.io.File(tmp).mkdirs()
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .where(col("doc_id") < 500)
      .foreachPartition { rows: Iterator[Row] =>
        val cs = java.nio.charset.StandardCharsets.UTF_8
        rows.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(tmp, r.getLong(0).toString + ".txt"),
            r.getString(1).getBytes(cs))
        }
      }
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.txt")
      .load(tmp)
      .select(
        regexp_extract(col("path"), "(\\d+)\\.txt$", 1).cast("long").as("doc_id"),
        col("length").cast("long").as("byte_len"),
        md5(col("content")).as("digest"))
      .orderBy("doc_id")
  }

  val q99Oracle: String =
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len, md5(text) AS digest
       FROM documents WHERE doc_id < 500 ORDER BY doc_id"""

  // ---- q100: Gopher repetition quality signals -------------------------------

  /** Per-document repetition filters from the Gopher/C4 pre-training
    * recipe: the fraction of all 2-gram occurrences taken by the single
    * most frequent 2-gram (`top2_frac`) and the fraction of 3-gram
    * occurrences whose gram appears more than once (`dup3_frac`), plus
    * the resulting keep decision. Shape: per-doc gram expansion is a pure
    * projection (higher-order array functions, no UDF), then ONE shuffle
    * per gram order on (doc_id, gram) and a per-doc re-agg — the same
    * two-level aggregation a 100-TB corpus needs (gram counts never
    * leave their doc's partition group; no global vocabulary is built,
    * unlike q97's corpus-wide heavy hitters).
    *
    * slice-based gram construction (not `sequence(0, n-2)`) because Spark
    * `sequence` generates DESCENDING ranges when stop < start — a
    * one-token doc would yield [1,0] instead of an empty list.
    */
  def q100RepetitionSignals(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    // both gram orders ride ONE explode (tagged by `ord`), so the whole
    // signal costs one gram-count shuffle + one per-doc re-agg instead of
    // a scan+two-shuffle chain per order
    val grams = docs.select(col("doc_id"), explode(concat(
        expr("transform(slice(t, 1, greatest(size(t)-1, 0)), (w, i) -> struct(2 AS ord, concat(w, ' ', t[i+1]) AS g))"),
        expr("transform(slice(t, 1, greatest(size(t)-2, 0)), (w, i) -> struct(3 AS ord, concat(w, ' ', t[i+1], ' ', t[i+2]) AS g))")
      )).as("og"))
      .select(col("doc_id"), col("og.ord").as("ord"), col("og.g").as("g"))
    val per = grams.groupBy("doc_id", "ord", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max(when(col("ord") === 2, col("c"))).as("mx2"),
        sum(when(col("ord") === 2, col("c")).otherwise(0L)).as("tot2"),
        sum(when(col("ord") === 3 && col("c") > 1, col("c")).otherwise(0L)).as("dup3"),
        sum(when(col("ord") === 3, col("c")).otherwise(0L)).as("tot3"))
    docs.select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
      .join(per, Seq("doc_id"), "left") // left: a <2-token doc has no grams
      .select(col("doc_id"), col("n_tokens"),
        graft.Stable.r4(coalesce(col("mx2").cast("double") / nullif(col("tot2"), lit(0)), lit(0.0))).as("top2_frac"),
        graft.Stable.r4(coalesce(col("dup3").cast("double") / nullif(col("tot3"), lit(0)), lit(0.0))).as("dup3_frac"))
      .withColumn("keep", col("top2_frac") <= 0.05 && col("dup3_frac") <= 0.1)
      .orderBy("doc_id")
  }

  val q100Oracle: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       g2 AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS g
              FROM toks, unnest(generate_series(1, len(t)-1)) AS u(i)),
       g3 AS (SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
              FROM toks, unnest(generate_series(1, len(t)-2)) AS u(i)),
       c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
       a2 AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS tot FROM c2 GROUP BY 1),
       c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2),
       a3 AS (SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup,
                     SUM(c) AS tot FROM c3 GROUP BY 1)
       SELECT d.doc_id, CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
         floor(COALESCE(CAST(a2.mx AS DOUBLE) / NULLIF(a2.tot, 0), 0.0) * 10000.0 + 0.5) / 10000.0 AS top2_frac,
         floor(COALESCE(CAST(a3.dup AS DOUBLE) / NULLIF(a3.tot, 0), 0.0) * 10000.0 + 0.5) / 10000.0 AS dup3_frac,
         (floor(COALESCE(CAST(a2.mx AS DOUBLE) / NULLIF(a2.tot, 0), 0.0) * 10000.0 + 0.5) / 10000.0 <= 0.05
          AND floor(COALESCE(CAST(a3.dup AS DOUBLE) / NULLIF(a3.tot, 0), 0.0) * 10000.0 + 0.5) / 10000.0 <= 0.1) AS keep
       FROM documents d
       LEFT JOIN a2 ON d.doc_id = a2.doc_id
       LEFT JOIN a3 ON d.doc_id = a3.doc_id
       ORDER BY d.doc_id"""

  // ---- q101: Z-order (Morton) layout clustering ------------------------------

  /** Write-time multi-dimensional clustering: interleave the bits of two
    * bounded dimensions (user bucket x, value bucket y) into a Morton
    * z-value, cluster rows into files by z ranges, and report per-file
    * min/max of BOTH dims — the footer stats a reader's predicate
    * `x BETWEEN .. AND y BETWEEN ..` would prune on. Linear (single-key)
    * sorting bounds only its leading dimension per file; z-ordering
    * bounds both at once, which is why Delta/Iceberg OPTIMIZE use it.
    *
    * Declared form assigns files with ntile over a global z sort so the
    * file split is an exact closed form both engines reproduce; the
    * production write is `repartitionByRange(nFiles, $"z")` + write,
    * which has the same per-file bounds without a single-partition
    * window (range boundaries come from a distributed sample instead of
    * a rank).
    */
  def q101ZorderLayout(s: SparkSession, dir: String): DataFrame = {
    val zed = t(s, dir, "events")
      .select(col("event_id"),
        (col("user_id") % 256).cast("long").as("x"),
        least(lit(255L), floor(col("value") / 2.2).cast("long")).as("y"))
      .withColumn("z", graft.ops.ZOrderLayout.mortonZ(col("x"), col("y"), 8))
    zed
      .withColumn("file_id",
        ntile(32).over(Window.orderBy(col("z"), col("event_id"))).cast("long"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"),
        min(col("z")).as("min_z"), max(col("z")).as("max_z"))
      .orderBy("file_id")
  }

  val q101Oracle: String =
    """WITH base AS (
         SELECT event_id, user_id % 256 AS x,
                LEAST(255, CAST(floor(value / 2.2) AS BIGINT)) AS y
         FROM events),
       zed AS (
         SELECT event_id, x, y,
           ((x>>0)&1)*1 + ((y>>0)&1)*2 + ((x>>1)&1)*4 + ((y>>1)&1)*8 +
           ((x>>2)&1)*16 + ((y>>2)&1)*32 + ((x>>3)&1)*64 + ((y>>3)&1)*128 +
           ((x>>4)&1)*256 + ((y>>4)&1)*512 + ((x>>5)&1)*1024 + ((y>>5)&1)*2048 +
           ((x>>6)&1)*4096 + ((y>>6)&1)*8192 + ((x>>7)&1)*16384 + ((y>>7)&1)*32768 AS z
         FROM base),
       filed AS (SELECT *, NTILE(32) OVER (ORDER BY z, event_id) AS file_id FROM zed)
       SELECT CAST(file_id AS BIGINT) AS file_id, COUNT(*) AS n,
         MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y, MAX(y) AS max_y,
         MIN(z) AS min_z, MAX(z) AS max_z
       FROM filed GROUP BY 1 ORDER BY 1"""

  // ---- q102: SemDeDup embedding-cluster near-dedup ---------------------------

  /** Semantic dedup at corpus scale (SemDeDup, Abbas et al. 2023): kmeans
    * cells bound the candidate pair space to same-cell pairs, exact
    * cosine verifies each candidate, and a document is dropped iff an
    * EARLIER document sharing a probed cell exceeds the threshold.
    * No-oracle (the kmeans fit is not SQL-expressible); SemDedupSpec pins
    * precision = 1 exactly (every recorded witness re-checked against
    * brute force), recall >= 0.9 vs the exact q44 pair set (measured
    * 0.935 at nCells=16/nProbe=3), and determinism.
    */
  def q102SemDedup(s: SparkSession, dir: String): DataFrame =
    graft.ops.Similarity.semDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
      nCells = 16, minCos = 0.4, nProbe = 3)
      .orderBy("vec_id")

  // ---- q103: passage chunking with overlap -----------------------------------

  /** RAG ingestion primitive: split each document into fixed-width
    * token-window passages with overlap (window W=32, stride S=24 — 8
    * tokens of context shared between neighbors), the step that turns a
    * document corpus into the passage table a retriever indexes (the
    * reference's `ra_dict` passages are exactly this shape). Pure per-row
    * array expansion — transform over a start-index sequence, slice per
    * window, explode — so the operator is embarrassingly parallel: no
    * shuffle at all until the declared deterministic ORDER BY. Passage
    * count per doc = 1 + floor((n-1)/S); the final window is allowed to
    * run short (slice clamps at n).
    */
  def q103PassageChunks(s: SparkSession, dir: String): DataFrame = {
    val (w, st) = (32, 24)
    t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn("n", size(col("t")))
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, (n-1) div $st),
              k -> struct(k AS p_idx, slice(t, k*$st+1, $w) AS p))""")).as("pp"))
      .select(col("doc_id"),
        col("pp.p_idx").cast("long").as("p_idx"),
        (col("pp.p_idx") * st).cast("long").as("start_tok"),
        size(col("pp.p")).cast("long").as("n_tok"),
        array_join(col("pp.p"), " ").as("p_text"))
      .orderBy("doc_id", "p_idx")
  }

  val q103Oracle: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t,
                            len(string_split(text, ' ')) AS n FROM documents),
       p AS (SELECT doc_id, k AS p_idx, k*24 AS start_tok,
               array_to_string(t[k*24+1 : least(k*24+32, n)], ' ') AS p_text,
               least(k*24+32, n) - k*24 AS n_tok
             FROM toks, unnest(generate_series(0, (n-1)//24)) AS u(k))
       SELECT doc_id, CAST(p_idx AS BIGINT) AS p_idx,
              CAST(start_tok AS BIGINT) AS start_tok,
              CAST(n_tok AS BIGINT) AS n_tok, p_text
       FROM p ORDER BY doc_id, p_idx"""

  // ---- q104: distributed BM25 scoring ----------------------------------------

  /** Okapi BM25 (k1=1.2, b=0.75, Lucene's +1 idf smoothing) for a fixed
    * query over the corpus — the lexical-retrieval scoring the TF-IDF
    * path (q42) approximates, here fully oracle-checked: every factor is
    * rational arithmetic over exact integer counts (tf, df, doc length;
    * the doc-length sum is integer-valued so even the avgdl mean is
    * order-insensitive), ln is the only transcendental.
    *
    * Scale shape: query terms filter the exploded token stream MAP-SIDE
    * (isin on a literal list) so only matching postings shuffle; df and
    * the corpus stats are tiny aggregates broadcast back; final score is
    * one groupBy(doc_id) + TakeOrdered(20). No global index is built —
    * this is the scan-side scoring pattern; a served system would bucket
    * by term instead (same arithmetic).
    */
  def q104Bm25(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("spark", "join", "merge")
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val dl = toks.select(col("doc_id"), size(col("t")).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = toks.select(col("doc_id"), explode(col("t")).as("tk"))
      .where(col("tk").isin(terms: _*))
      .groupBy("doc_id", "tk").agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy("tk")
      .agg(countDistinct(col("doc_id")).cast("double").as("df"))
    val score = tf.join(broadcast(df), Seq("tk"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(sum(graft.ops.Lexical.bm25Term(col("tf"), col("df"), col("dl"),
        col("n_docs"), col("avgdl"))).as("score"))
    score.select(col("doc_id"), graft.Stable.r4(col("score")).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(20)
  }

  val q104Oracle: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks),
       stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
       tf AS (SELECT doc_id, tk, CAST(COUNT(*) AS DOUBLE) AS tf
              FROM (SELECT doc_id, unnest(t) AS tk FROM toks)
              WHERE tk IN ('spark', 'join', 'merge') GROUP BY 1, 2),
       df AS (SELECT tk, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY 1),
       scored AS (
         SELECT tf.doc_id,
           SUM( ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS score
         FROM tf JOIN df USING (tk) JOIN dl USING (doc_id) CROSS JOIN stats s
         GROUP BY 1)
       SELECT doc_id, floor(score * 10000.0 + 0.5) / 10000.0 AS bm25
       FROM scored ORDER BY bm25 DESC, doc_id LIMIT 20"""

  // ---- q178: BM25 SERVED off ModelStore-persisted postings -------------------

  /** The BUILD/SERVE split for LEXICAL retrieval — q104's scorer with
    * the corpus pass amortized away, the text-side twin of the graph
    * family's q171→q172 split ([[graft.ops.Lexical]]): the posting
    * table (term, doc_id, tf, dl) is built in ONE tokenize+shuffle pass
    * and published through ModelStore partitioned by a 64-way term-hash
    * bucket, so a query's scan prunes to ≤ |terms| directories at the
    * LISTING level (PartitionFilters — the q88 pattern) and serving
    * work is proportional to the query terms' posting lists, never the
    * corpus. df re-derives from the pruned slice (a term's postings all
    * live in its bucket, so the marginal is exact) and the score is
    * q104's identical IEEE expression — the query carries q104's full
    * DuckDB hash oracle VERBATIM. Bm25ServedSpec pins bit-for-bit
    * parity with q104, the PartitionFilters prune, and the
    * no-tokenize-stages serve plan. */
  def q178Bm25Served(s: SparkSession, dir: String): DataFrame = {
    val (postings, stats) = graft.ops.Lexical.servedPostingsFor(
      s, dir, t(s, dir, "documents"), "doc_id", "text")
    graft.ops.Lexical.bm25TopK(postings, stats,
      Seq("spark", "join", "merge"), 20)
  }

  // ---- q105: PageRank (iterative distributed graph compute) ------------------

  /** Three unrolled power iterations of PageRank (damping 0.85, no
    * dangling-mass redistribution — the formula both engines run
    * verbatim) over a deterministic graph derived from the event stream:
    * an edge src→dst whenever dst's event directly follows src's within
    * an event_type (lead window over (epoch-ms, event_id) — millisecond
    * flooring because the engines disagree below the microsecond, see
    * [[Tables]]). Complements q81's connected components as the second
    * iterative-fixpoint operator class: per iteration one join-agg
    * shuffle (contributions grouped by dst) + the nodes left-join; at
    * real iteration counts the loop persists + localCheckpoints each
    * rank frame exactly like `Dedup.clusterPairs` — 3 unrolled rounds
    * keep the lineage trivially bounded here. Ranks round at 1e-7 (finer
    * than Stable.r4: rank mass per node is ~1/N ≈ 6e-3, so 4 decimals
    * would erase the ordering the query exists to compute).
    */
  def q105PageRank(s: SparkSession, dir: String): DataFrame = {
    val r7 = (c: Column) => floor(c * 1e7 + 0.5) / 1e7
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"), col("event_id"))
    val w = Window.partitionBy("event_type").orderBy("ms", "event_id")
    val edges = ev
      .select(col("user_id").as("src"), lead(col("user_id"), 1).over(w).as("dst"))
      .where(col("dst").isNotNull && col("dst") =!= col("src"))
      .distinct()
    val nodes = ev.select(col("user_id")).distinct()
    val n = nodes.count().toDouble
    val outdeg = edges.groupBy("src").agg(count(lit(1)).cast("double").as("od"))
    val withOd = edges.join(outdeg, Seq("src"))
    var rank = nodes.select(col("user_id"), (lit(1e0) / n).as("r"))
    for (_ <- 1 to 3) {
      val contrib = withOd.join(rank, col("src") === rank("user_id"))
        .groupBy("dst").agg(sum(col("r") / col("od")).as("s"))
      rank = nodes.join(contrib, nodes("user_id") === contrib("dst"), "left")
        .select(nodes("user_id"),
          (lit(1.5e-1) / n + lit(8.5e-1) * coalesce(col("s"), lit(0e0))).as("r"))
    }
    rank.select(col("user_id"), r7(col("r")).as("pr")).orderBy("user_id")
  }

  val q105Oracle: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id FROM events),
       nb AS (SELECT user_id AS src,
                lead(user_id) OVER (PARTITION BY event_type ORDER BY ms, event_id) AS dst
              FROM ev),
       edges AS (SELECT DISTINCT src, dst FROM nb WHERE dst IS NOT NULL AND dst <> src),
       nodes AS (SELECT DISTINCT user_id FROM ev),
       n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
       outdeg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS od FROM edges GROUP BY 1),
       r0 AS (SELECT user_id, 1e0 / (SELECT n FROM n) AS r FROM nodes),
       c1 AS (SELECT e.dst, SUM(r0.r / o.od) AS s FROM edges e
              JOIN r0 ON e.src = r0.user_id JOIN outdeg o ON e.src = o.src GROUP BY 1),
       r1 AS (SELECT nodes.user_id, 1.5e-1 / (SELECT n FROM n) + 8.5e-1 * COALESCE(c1.s, 0e0) AS r
              FROM nodes LEFT JOIN c1 ON nodes.user_id = c1.dst),
       c2 AS (SELECT e.dst, SUM(r1.r / o.od) AS s FROM edges e
              JOIN r1 ON e.src = r1.user_id JOIN outdeg o ON e.src = o.src GROUP BY 1),
       r2 AS (SELECT nodes.user_id, 1.5e-1 / (SELECT n FROM n) + 8.5e-1 * COALESCE(c2.s, 0e0) AS r
              FROM nodes LEFT JOIN c2 ON nodes.user_id = c2.dst),
       c3 AS (SELECT e.dst, SUM(r2.r / o.od) AS s FROM edges e
              JOIN r2 ON e.src = r2.user_id JOIN outdeg o ON e.src = o.src GROUP BY 1),
       r3 AS (SELECT nodes.user_id, 1.5e-1 / (SELECT n FROM n) + 8.5e-1 * COALESCE(c3.s, 0e0) AS r
              FROM nodes LEFT JOIN c3 ON nodes.user_id = c3.dst)
       SELECT user_id, floor(r * 1e7 + 5e-1) / 1e7 AS pr FROM r3 ORDER BY user_id"""

  // ---- q106/q107: embedding post-processing batteries ------------------------

  /** Per-label element-wise centroid of the embedding corpus — the class
    * prototype vectors semantic curation uses (cluster labeling, nearest-
    * centroid classification, SemDeDup's own cell seeds). Relational
    * shape: posexplode to (label, pos, val) and ONE shuffle on
    * (label, pos) — at any corpus size the state per reducer is a single
    * running mean, and the output is nLabels x dim rows, never a
    * collected matrix. */
  def q106LabelCentroids(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos0", "val")))
      .groupBy(col("label"), (col("pos0") + 1).cast("long").as("pos"))
      .agg((floor(avg(col("val")) * 1e4 + 0.5) / 1e4).as("c"),
        count(lit(1)).as("n"))
      .orderBy("label", "pos")

  val q106Oracle: String =
    """WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
       x AS (SELECT label, i AS pos, v[i] AS val
             FROM e, unnest(generate_series(1, len(v))) AS u(i))
       SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
         floor(AVG(val) * 1e4 + 5e-1) / 1e4 AS c, COUNT(*) AS n
       FROM x GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Per-vector norm battery: L2 norm and Matryoshka prefix energy (the
    * fraction of squared mass in the first 16 of 64 dims — the number
    * that says whether truncating the embedding to a cheaper prefix,
    * MRL-style, preserves geometry). Pure per-row kernels over the
    * shared [[graft.ops.Similarity.dot]] expression; sqrt is exactly
    * rounded in IEEE-754 so both engines land on identical doubles. */
  def q107EmbeddingNorms(s: SparkSession, dir: String): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val d = graft.ops.Similarity.dot _
    t(s, dir, "embeddings")
      .select(col("vec_id"), v.as("v"))
      .select(col("vec_id"),
        (floor(sqrt(d(col("v"), col("v"))) * 1e4 + 0.5) / 1e4).as("l2"),
        (floor(d(slice(col("v"), 1, 16), slice(col("v"), 1, 16))
          / d(col("v"), col("v")) * 1e4 + 0.5) / 1e4).as("prefix16_energy"))
      .orderBy("vec_id")
  }

  val q107Oracle: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
       SELECT vec_id,
         floor(sqrt(list_inner_product(v, v)) * 1e4 + 5e-1) / 1e4 AS l2,
         floor((list_inner_product(v[1:16], v[1:16]) / list_inner_product(v, v)) * 1e4 + 5e-1) / 1e4 AS prefix16_energy
       FROM e ORDER BY vec_id"""

  // ---- q108: MERGE-style corpus upsert ---------------------------------------

  /** Incremental corpus maintenance: a batch of revised/new documents
    * merges into the corpus — matched ids take the new text, unmatched
    * base rows survive, unmatched updates insert (Delta/Iceberg MERGE
    * semantics spelled as the full-outer-join + coalesce rewrite every
    * engine without a MERGE operator uses). The update batch is
    * synthesized deterministically from the corpus itself (a revision
    * marker; half on existing ids, half offset onto fresh ids) so both
    * engines derive identical inputs and all three MERGE arms fire.
    * One shuffle on the join key; per-row provenance (`action`) makes the
    * rewrite auditable like q95. At scale the same join runs partitioned
    * on doc_id and writes partition-aligned — no driver state.
    */
  def q108MergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"), col("lang"))
    // half the batch revises existing ids, half lands on fresh ids (offset
    // past any corpus) so the update/insert/keep arms all fire at every SF
    val updates = base
      .where(col("doc_id") < 500)
      .select(
        when(col("doc_id") < 250, col("doc_id") + 100000)
          .otherwise(col("doc_id")).as("doc_id"),
        concat(lit("rev2 "), col("text")).as("u_text"))
    base.join(updates, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("u_text").isNotNull && col("text").isNotNull, lit("update"))
          .when(col("u_text").isNotNull, lit("insert"))
          .otherwise(lit("keep")).as("action"),
        coalesce(col("u_text"), col("text")).as("text_out"),
        col("lang"))
      .select(col("doc_id"), col("action"),
        length(col("text_out")).cast("long").as("n_chars_out"), col("lang"))
      .orderBy("doc_id")
  }

  val q108Oracle: String =
    """WITH updates AS (
         SELECT CASE WHEN doc_id < 250 THEN doc_id + 100000 ELSE doc_id END AS doc_id,
                'rev2 ' || text AS u_text
         FROM documents WHERE doc_id < 500)
       SELECT COALESCE(b.doc_id, u.doc_id) AS doc_id,
         CASE WHEN u.u_text IS NOT NULL AND b.text IS NOT NULL THEN 'update'
              WHEN u.u_text IS NOT NULL THEN 'insert'
              ELSE 'keep' END AS action,
         CAST(strlen(COALESCE(u.u_text, b.text)) AS BIGINT) AS n_chars_out,
         b.lang
       FROM documents b FULL OUTER JOIN updates u ON b.doc_id = u.doc_id
       ORDER BY doc_id"""

  // ---- q109: per-group adaptive median filter --------------------------------

  /** Adaptive quality gate: keep a document iff its token count reaches
    * its OWN language's median — thresholds derived from the data, not
    * configured, the way curation pipelines normalize quality cutoffs
    * across heterogeneous subcorpora. Median is the discrete lower
    * median (row_number = (cnt+1) div 2 over (n_tokens, doc_id)) —
    * integer arithmetic, so both engines agree exactly with no
    * interpolation formula to reconcile. Shape: one window shuffle on
    * lang + a broadcast of the tiny per-lang threshold table.
    */
  def q109MedianFilter(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val w = Window.partitionBy("lang").orderBy("n_tokens", "doc_id")
    val med = docs
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("lang")))
      .where(col("rn") === expr("(cnt + 1) div 2"))
      .select(col("lang"), col("n_tokens").as("med"))
    docs.join(broadcast(med), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("med"),
        (col("n_tokens") >= col("med")).as("kept"))
      .orderBy("doc_id")
  }

  val q109Oracle: String =
    """WITH docs AS (SELECT doc_id, lang,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
       ranked AS (SELECT lang, n_tokens,
            ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS rn,
            COUNT(*) OVER (PARTITION BY lang) AS cnt FROM docs),
       med AS (SELECT lang, n_tokens AS med FROM ranked WHERE rn = (cnt + 1) // 2)
       SELECT d.doc_id, d.lang, d.n_tokens, m.med, d.n_tokens >= m.med AS kept
       FROM docs d JOIN med m ON d.lang = m.lang
       ORDER BY d.doc_id"""

  // ---- q110: exponential time-decay engagement -------------------------------

  /** Freshness-weighted per-user engagement: each event contributes
    * value * exp(-ln2 * age/halflife) with a 7-day half-life, anchored at
    * the corpus max timestamp (a deterministic anchor both engines
    * derive — never wall-clock, which would unpin the oracle). The
    * standard recency-weighting for sampling weights / user features;
    * ages are epoch-ms integer differences (exact), the decay literal is
    * spelled identically in both dialects, and exp is the only
    * transcendental (same ulp posture as q104's ln). Shape: the 1-row
    * anchor broadcasts; one groupBy(user_id) shuffle does the rest. */
  def q110DecayedEngagement(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), col("value"))
    val anchor = ev.agg(max(col("ms")).as("mx"))
    ev.crossJoin(broadcast(anchor))
      .groupBy("user_id")
      .agg(
        sum(col("value") * exp(lit(-6.93147180559945e-1)
          * ((col("mx") - col("ms")).cast("double") / lit(6.048e8)))).as("dec_sum"),
        count(lit(1)).as("n_events"),
        sum(when(col("mx") - col("ms") <= 604800000L, 1L).otherwise(0L)).as("recent"))
      .select(col("user_id"),
        (floor(col("dec_sum") * 1e4 + 0.5) / 1e4).as("decayed_value"),
        col("n_events"), col("recent"))
      .orderBy("user_id")
  }

  val q110Oracle: String =
    """WITH ev AS (SELECT user_id, epoch_ms(ts) AS ms, value FROM events),
       anchor AS (SELECT MAX(ms) AS mx FROM ev),
       scored AS (
         SELECT user_id,
           SUM(value * exp(-6.93147180559945e-1
               * (CAST((SELECT mx FROM anchor) - ms AS DOUBLE) / 6.048e8))) AS dec_sum,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN (SELECT mx FROM anchor) - ms <= 604800000 THEN 1 ELSE 0 END) AS BIGINT) AS recent
         FROM ev GROUP BY 1)
       SELECT user_id, floor(dec_sum * 1e4 + 5e-1) / 1e4 AS decayed_value,
              n_events, recent
       FROM scored ORDER BY user_id"""

  // ---- q111: AVI container demux ---------------------------------------------

  /** REAL video-container demux (q87/q90 style): per document a small
    * AVI is synthesized from a closed-form byte generator (frame k, byte
    * j = (doc_id*31 + k*7 + j*3) mod 256), muxed into a standard RIFF/AVI
    * container (LIST hdrl/avih/strl + LIST movi with '00dc' chunks,
    * word-aligned), then DEMUXED back by walking the real chunk tree —
    * and the oracle recomputes the demuxed frame content arithmetically
    * in SQL. The weighted checksum is order-sensitive across frames AND
    * bytes, so a demuxer that drops a frame, misreads a chunk size, or
    * forgets the odd-byte pad rule hash-mismatches. Decode is a
    * partition-local kernel (mapPartitions shape like q74/q87/q90);
    * codec payloads pass through opaque — the demux layer is exactly
    * what frame sampling and per-frame routing need at corpus scale.
    */
  def q111AviDemux(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal.MediaKernels
    val demuxStats = udf((docId: Long) => {
      val nFrames = 1 + (docId % 4).toInt
      val frameSize = 48 + (docId % 3).toInt * 16
      val width = 16 + (docId % 8).toInt
      val height = 8 + (docId % 5).toInt
      val frames = Array.tabulate(nFrames) { k =>
        Array.tabulate[Byte](frameSize)(j => ((docId * 31 + k * 7 + j * 3) % 256).toByte)
      }
      val avi = MediaKernels.muxAvi(width, height, 33333, frames)
      MediaKernels.demuxAvi(avi) match {
        case Some(v) =>
          var wsum = 0L
          var k = 0
          while (k < v.frames.length) {
            val f = v.frames(k); var j = 0
            while (j < f.length) {
              wsum += (k.toLong * frameSize + j + 1) * (f(j) & 0xFF); j += 1
            }
            k += 1
          }
          (v.width, v.height, v.usPerFrame, v.frames.length,
            v.frames.map(_.length.toLong).sum, wsum)
        case None => (-1, -1, -1, -1, -1L, -1L)
      }
    })
    t(s, dir, "documents")
      .select(col("doc_id"), demuxStats(col("doc_id")).as("d"))
      .select(col("doc_id"),
        col("d._1").cast("long").as("width"),
        col("d._2").cast("long").as("height"),
        col("d._3").cast("long").as("us_per_frame"),
        col("d._4").cast("long").as("n_frames"),
        col("d._5").as("payload_bytes"),
        col("d._6").as("wsum"))
      .orderBy("doc_id")
  }

  val q111Oracle: String =
    """WITH params AS (
         SELECT doc_id,
           1 + doc_id % 4 AS nf,
           48 + (doc_id % 3) * 16 AS fs,
           16 + doc_id % 8 AS width,
           8 + doc_id % 5 AS height
         FROM documents),
       cells AS (
         SELECT doc_id, fs, k, j,
           (CAST(k * fs + j + 1 AS BIGINT)) * ((doc_id * 31 + k * 7 + j * 3) % 256) AS w
         FROM params,
           unnest(generate_series(0, nf - 1)) AS uk(k),
           unnest(generate_series(0, fs - 1)) AS uj(j))
       SELECT p.doc_id, CAST(p.width AS BIGINT) AS width,
         CAST(p.height AS BIGINT) AS height,
         CAST(33333 AS BIGINT) AS us_per_frame,
         CAST(p.nf AS BIGINT) AS n_frames,
         CAST(p.nf * p.fs AS BIGINT) AS payload_bytes,
         CAST(SUM(c.w) AS BIGINT) AS wsum
       FROM params p JOIN cells c ON p.doc_id = c.doc_id
       GROUP BY 1, 2, 3, 4, 5, 6
       ORDER BY p.doc_id"""

  // ---- q112: IMA ADPCM compressed-audio decode -------------------------------

  /** REAL compressed-audio decode, oracle-checked: per document a 4-bit
    * IMA ADPCM nibble stream is synthesized closed-form (nibble k =
    * (doc_id*7 + k*3) mod 16, initial step index doc_id mod 89) and
    * decoded through the published step-table state machine
    * ([[graft.ops.Multimodal.MediaKernels.decodeImaAdpcm]]). The decode
    * is pure integer DSP — predictor/index clamps, step>>k accumulation
    * — so DuckDB replays the EXACT recurrence as a recursive CTE (the
    * q81 precedent) and every output column is an integer: a bit-exact
    * oracle over a genuinely stateful codec, no fp anywhere. Decode is a
    * per-row partition-local kernel like the other media paths.
    */
  def q112AdpcmDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal.MediaKernels
    val decodeStats = udf((docId: Long) => {
      val nn = 32 + (docId % 3).toInt * 16
      val nibbles = Array.tabulate[Byte](nn)(k => ((docId * 7 + k * 3) % 16).toByte)
      val pcm = MediaKernels.decodeImaAdpcm(nibbles, 0, (docId % 89).toInt)
      var ssum = 0L; var wsum = 0L; var i = 0
      while (i < pcm.length) {
        ssum += pcm(i); wsum += (i + 1).toLong * pcm(i); i += 1
      }
      (pcm.length.toLong, pcm.last.toLong, ssum, wsum)
    })
    t(s, dir, "documents")
      .where(col("doc_id") < 500)
      .select(col("doc_id"), decodeStats(col("doc_id")).as("d"))
      .select(col("doc_id"),
        col("d._1").as("n_samples"), col("d._2").as("last_pred"),
        col("d._3").as("ssum"), col("d._4").as("wsum"))
      .orderBy("doc_id")
  }

  val q112Oracle: String = {
    val st = "[7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41,45,50," +
      "55,60,66,73,80,88,97,107,118,130,143,157,173,190,209,230,253,279," +
      "307,337,371,408,449,494,544,598,658,724,796,876,963,1060,1166,1282," +
      "1411,1552,1707,1878,2066,2272,2499,2749,3024,3327,3660,4026,4428," +
      "4871,5358,5894,6484,7132,7845,8630,9493,10442,11487,12635,13899," +
      "15289,16818,18500,20350,22385,24623,27086,29794,32767]"
    val it = "[-1,-1,-1,-1,2,4,6,8]"
    s"""WITH RECURSIVE
       params AS (SELECT doc_id, 32 + (doc_id % 3) * 16 AS nn
                  FROM documents WHERE doc_id < 500),
       dec AS (
         SELECT doc_id, nn, 0 AS k, 0 AS pred, CAST(doc_id % 89 AS INTEGER) AS idx,
                CAST(0 AS BIGINT) AS ssum, CAST(0 AS BIGINT) AS wsum
         FROM params
         UNION ALL
         SELECT doc_id, nn, k + 1, new_pred, new_idx,
                ssum + new_pred, wsum + CAST(k + 1 AS BIGINT) * new_pred
         FROM (
           SELECT doc_id, nn, k, ssum, wsum, n, idx,
             GREATEST(-32768, LEAST(32767,
               CASE WHEN (n & 8) != 0 THEN pred - diff ELSE pred + diff END)) AS new_pred,
             GREATEST(0, LEAST(88, idx + $it[(n % 8) + 1])) AS new_idx
           FROM (
             SELECT *,
               (st >> 3)
               + CASE WHEN (n & 4) != 0 THEN st ELSE 0 END
               + CASE WHEN (n & 2) != 0 THEN st >> 1 ELSE 0 END
               + CASE WHEN (n & 1) != 0 THEN st >> 2 ELSE 0 END AS diff
             FROM (
               SELECT doc_id, nn, k, pred, idx, ssum, wsum,
                 CAST((doc_id * 7 + k * 3) % 16 AS INTEGER) AS n,
                 $st[idx + 1] AS st
               FROM dec WHERE k < nn) x) y)
       )
       SELECT doc_id, CAST(nn AS BIGINT) AS n_samples, CAST(pred AS BIGINT) AS last_pred,
              ssum, wsum
       FROM dec WHERE k = nn ORDER BY doc_id"""
  }

  // ---- q113: bilinear resize (real resampler) --------------------------------

  /** REAL image resampling, oracle-checked: per document a gradient
    * raster is synthesized closed-form (pixel (x,y,c) = (3x+5y+7c+doc)
    * mod 256), resized to 8x6 through the 8.8 fixed-point bilinear
    * kernel ([[graft.ops.Multimodal.MediaKernels.resizeBilinear]]), and
    * the resized pixels checked via an order-sensitive weighted sum the
    * oracle recomputes arithmetically — source coordinates, fractional
    * weights, and the >>16 normalization are all integer ops, so the
    * resample is bit-identical in both engines. Misaligned coordinates,
    * swapped axes, or off-by-one edge clamps all shift the weighted sum.
    */
  def q113BilinearResize(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal.{DecodedImage, MediaKernels}
    val resizeStats = udf((docId: Long) => {
      val sw = 16 + (docId % 8).toInt
      val sh = 8 + (docId % 5).toInt
      val pixels = new Array[Byte](sw * sh * 3)
      var i = 0
      while (i < pixels.length) {
        val c = i % 3; val x = (i / 3) % sw; val y = i / (3 * sw)
        pixels(i) = ((3 * x + 5 * y + 7 * c + docId) % 256).toByte
        i += 1
      }
      MediaKernels.resizeBilinear(DecodedImage(sw, sh, 255, pixels), 8, 6) match {
        case Some(r) =>
          var wsum = 0L; var j = 0
          while (j < r.pixels.length) { wsum += (j + 1).toLong * (r.pixels(j) & 0xFF); j += 1 }
          (r.width.toLong, r.height.toLong, wsum)
        case None => (-1L, -1L, -1L)
      }
    })
    t(s, dir, "documents")
      .where(col("doc_id") < 500)
      .select(col("doc_id"), resizeStats(col("doc_id")).as("d"))
      .select(col("doc_id"), col("d._1").as("out_w"), col("d._2").as("out_h"),
        col("d._3").as("wsum"))
      .orderBy("doc_id")
  }

  val q113Oracle: String =
    """WITH params AS (
         SELECT doc_id, 16 + doc_id % 8 AS sw, 8 + doc_id % 5 AS sh
         FROM documents WHERE doc_id < 500),
       cells AS (
         SELECT doc_id, sw, sh, x, y, c,
           (x * (sw - 1) * 256) // 7 AS sxf,
           (y * (sh - 1) * 256) // 5 AS syf
         FROM params,
           unnest(generate_series(0, 7)) AS ux(x),
           unnest(generate_series(0, 5)) AS uy(y),
           unnest(generate_series(0, 2)) AS uc(c)),
       interp AS (
         SELECT doc_id, x, y, c,
           sxf // 256 AS sx, sxf % 256 AS fx, LEAST(sw - 1, sxf // 256 + 1) AS sx1,
           syf // 256 AS sy, syf % 256 AS fy, LEAST(sh - 1, syf // 256 + 1) AS sy1
         FROM cells),
       vals AS (
         SELECT doc_id, x, y, c,
           (((3 * sx + 5 * sy + 7 * c + doc_id) % 256) * (256 - fx) * (256 - fy)
            + ((3 * sx1 + 5 * sy + 7 * c + doc_id) % 256) * fx * (256 - fy)
            + ((3 * sx + 5 * sy1 + 7 * c + doc_id) % 256) * (256 - fx) * fy
            + ((3 * sx1 + 5 * sy1 + 7 * c + doc_id) % 256) * fx * fy
            + 32768) // 65536 AS v
         FROM interp)
       SELECT doc_id, CAST(8 AS BIGINT) AS out_w, CAST(6 AS BIGINT) AS out_h,
         CAST(SUM(CAST(3 * (y * 8 + x) + c + 1 AS BIGINT) * v) AS BIGINT) AS wsum
       FROM vals GROUP BY 1 ORDER BY doc_id"""

  // ---- q115: Motion-JPEG video-frame decode (full AVI pipeline) --------------

  /** REAL video-frame decode end to end: per document a short clip is
    * synthesized (frame k, pixel i = (doc_id*37 + k*13 + i*11) mod 256),
    * each frame ImageIO-encoded and packed as a '00dc' chunk into a real
    * RIFF/AVI container ([[graft.ops.Multimodal.MediaKernels.muxAvi]]),
    * then the clip is DEMUXED and every frame payload DECODED back to a
    * raster ([[graft.ops.Multimodal.MediaKernels.decodeImage]]) — the
    * Motion-JPEG pipeline shape (codec-in-container), composed from the
    * same demux (q111) and image-decode (q90) halves this engine already
    * oracles separately. Two codec legs, one oracle:
    *
    *   - PNG frames are lossless, so the decoded rasters must equal the
    *     closed form bit-for-bit — the oracle recomputes the
    *     order-sensitive weighted sum over frames AND pixels (Σ_k Σ_i
    *     (k·w·h·3 + i + 1)·v), which a dropped frame, frame-order swap,
    *     chunk misread, or channel/row-order bug all diverge.
    *   - JPEG frames (true MJPEG) are lossy by spec, so that leg uses
    *     q90's DC trick: solid-color frames are pure DC, and a real JPEG
    *     decode must land within quantization error (MAE ≤ 8/255, dims
    *     exact) on every frame — surfaced as `mjpeg_ok` in the hash.
    *
    * Decode is a per-row partition-local kernel (mapPartitions shape):
    * each task decodes its own clips, nothing crosses partitions — the
    * embarrassingly-parallel 100-TB video-corpus shape.
    */
  def q115MjpegFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.Multimodal.{DecodedImage, MediaKernels}
    val ids = t(s, dir, "documents")
      .where(col("doc_id") < 500)
      .select(col("doc_id").cast("long")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val nf = 2 + (id % 3).toInt
        val w = (3 + id % 5).toInt
        val h = (2 + id % 4).toInt
        val fb = w * h * 3
        // lossless leg: PNG-encoded gradient frames through the AVI mux
        val pngFrames = Array.tabulate(nf) { k =>
          val px = Array.tabulate[Byte](fb)(i => ((id * 37 + k * 13 + i.toLong * 11) % 256).toByte)
          MediaKernels.encodeImage(DecodedImage(w, h, 255, px), "png")
        }
        val demuxed = MediaKernels.demuxAvi(MediaKernels.muxAvi(w, h, 40000, pngFrames))
        val (nFrames, wsum) = demuxed match {
          case Some(v) if v.width == w && v.height == h =>
            var ws = 0L; var ok = true
            var k = 0
            while (k < v.frames.length) {
              MediaKernels.decodeImage(v.frames(k)) match {
                case Some(img) if img.width == w && img.height == h =>
                  var i = 0
                  while (i < img.pixels.length) {
                    ws += (k.toLong * fb + i + 1) * (img.pixels(i) & 0xFF); i += 1
                  }
                case _ => ok = false
              }
              k += 1
            }
            if (ok) (v.frames.length.toLong, ws) else (-1L, -1L)
          case _ => (-1L, -1L)
        }
        // lossy leg (true Motion-JPEG): solid-color frames are pure DC, so
        // a real JPEG decode stays within quantization error per frame
        val jpgFrames = Array.tabulate(nf) { k =>
          val solid = Array.tabulate[Byte](fb)(i => (i % 3 match {
            case 0 => (id * 37 + k * 29) % 256
            case 1 => (id * 91 + k * 17) % 256
            case _ => (id * 53 + k * 23) % 256
          }).toByte)
          (solid, MediaKernels.encodeImage(DecodedImage(w, h, 255, solid), "jpg"))
        }
        val mjpegOk = MediaKernels.demuxAvi(
            MediaKernels.muxAvi(w, h, 40000, jpgFrames.map(_._2))).exists { v =>
          v.frames.length == nf && v.frames.indices.forall { k =>
            MediaKernels.decodeImage(v.frames(k)).exists { img =>
              var err = 0L; var i = 0
              val solid = jpgFrames(k)._1
              while (i < img.pixels.length) {
                err += math.abs((img.pixels(i) & 0xFF) - (solid(i) & 0xFF)); i += 1
              }
              img.width == w && img.height == h && err / math.max(1, img.pixels.length) <= 8
            }
          }
        }
        (id, nFrames, w.toLong, h.toLong, wsum, mjpegOk)
      }
    }.toDF("doc_id", "n_frames", "img_w", "img_h", "wsum", "mjpeg_ok")
      .orderBy("doc_id")
  }

  val q115Oracle: String =
    """WITH params AS (
         SELECT doc_id, 2 + doc_id % 3 AS nf, 3 + doc_id % 5 AS w, 2 + doc_id % 4 AS h
         FROM documents WHERE doc_id < 500),
       cells AS (
         SELECT doc_id,
           CAST(k * (w*h*3) + i + 1 AS BIGINT) * ((doc_id*37 + k*13 + i*11) % 256) AS wv
         FROM params,
           unnest(generate_series(0, nf - 1)) AS uk(k),
           unnest(generate_series(0, w*h*3 - 1)) AS ui(i))
       SELECT p.doc_id, CAST(p.nf AS BIGINT) AS n_frames,
         CAST(p.w AS BIGINT) AS img_w, CAST(p.h AS BIGINT) AS img_h,
         CAST(SUM(c.wv) AS BIGINT) AS wsum, TRUE AS mjpeg_ok
       FROM params p JOIN cells c USING (doc_id)
       GROUP BY 1, 2, 3, 4 ORDER BY p.doc_id"""

  // ---- q114: length-bucketed batching / padding-waste accounting -------------

  /** Inference/training batching efficiency: assign each document to a
    * power-of-two length bucket (16/32/64/128, clamped), then account
    * per bucket how many pad tokens batching at that width costs
    * (`waste_frac` = padded-minus-real over padded) and how many
    * batches of 8 the bucket fills. Length bucketing is the standard
    * trick that keeps GPU batches dense — the waste metric is what you
    * tune bucket boundaries against. Bucket assignment is a pure CASE
    * projection (no transcendentals), one groupBy(bucket) shuffle. */
  def q114LengthBuckets(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        least(lit(128L), size(split(col("text"), " ")).cast("long")).as("n"))
      .withColumn("bucket",
        when(col("n") <= 16, 16L).when(col("n") <= 32, 32L)
          .when(col("n") <= 64, 64L).otherwise(128L))
    docs.groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("total_tokens"))
      .withColumn("padded_tokens", col("bucket") * col("n_docs"))
      .withColumn("waste_frac", graft.Stable.r4(
        lit(1.0) - col("total_tokens").cast("double") / col("padded_tokens")))
      .withColumn("n_batches", (col("n_docs") + 7L) / lit(8L) cast "long")
      .orderBy("bucket")
  }

  val q114Oracle: String =
    """WITH docs AS (
         SELECT doc_id, LEAST(128, CAST(len(string_split(text, ' ')) AS BIGINT)) AS n
         FROM documents),
       bucketed AS (
         SELECT n, CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
                        WHEN n <= 64 THEN 64 ELSE 128 END AS bucket
         FROM docs)
       SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_docs,
         CAST(SUM(n) AS BIGINT) AS total_tokens,
         CAST(bucket * COUNT(*) AS BIGINT) AS padded_tokens,
         floor((1.0 - CAST(SUM(n) AS DOUBLE) / (bucket * COUNT(*))) * 1e4 + 5e-1) / 1e4 AS waste_frac,
         CAST((COUNT(*) + 7) // 8 AS BIGINT) AS n_batches
       FROM bucketed GROUP BY bucket ORDER BY bucket"""

  // ---- q116: PII redaction (emails / phone numbers) --------------------------

  /** Training-corpus PII scrub: detect and mask email addresses and
    * phone numbers, reporting per-record match counts plus a digest of
    * the redacted text (the auditable what-changed record a compliance
    * pass needs). Profiles are synthesized deterministically from the
    * customer table so the PII patterns actually fire (the reference
    * corpus carries none); the operator itself is a pure projection —
    * regex scan + global replace per record, no shuffle at all, the
    * embarrassingly-parallel shape a 100-TB scrub wants (contrast
    * dedup/agg ops: a scrub touches every byte but exchanges nothing).
    *
    * Pattern discipline: no `\b` word boundaries (Java regex is
    * Unicode-aware where RE2 is ASCII — the one construct that silently
    * diverges between the engines), only character classes and bounded
    * repetition, which Java and RE2 agree on exactly. */
  def q116PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\d{2}-\\d{3}-\\d{3}-\\d{4}"
    // deterministic synthetic phone (the driver's customer table carries
    // no c_phone): 2-3-3-4 digit groups derived from the key
    val phone = concat(
      lpad((lit(10L) + col("c_custkey") % 90L).cast("string"), 2, "0"), lit("-"),
      lpad((col("c_custkey") % 1000L).cast("string"), 3, "0"), lit("-"),
      lpad(((col("c_custkey") * 7L) % 1000L).cast("string"), 3, "0"), lit("-"),
      lpad(((col("c_custkey") * 13L) % 10000L).cast("string"), 4, "0"))
    val prof = t(s, dir, "customer")
      .select(col("c_custkey").cast("long").as("c_custkey"),
        concat(col("c_name"), lit(" <"),
          lower(regexp_replace(col("c_name"), "#", "")), lit("@example.com> phone "),
          phone, lit(" seg "), col("c_mktsegment")).as("profile"))
    prof.select(col("c_custkey"),
        size(regexp_extract_all(col("profile"), lit(emailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("profile"), lit(phoneRe), lit(0)))
          .cast("long").as("n_phones"),
        md5(regexp_replace(regexp_replace(col("profile"), emailRe, "[EMAIL]"),
          phoneRe, "[PHONE]")).as("redacted_md5"))
      .orderBy("c_custkey")
  }

  val q116Oracle: String =
    """WITH prof AS (
         SELECT c_custkey,
           c_name || ' <' || lower(replace(c_name, '#', '')) || '@example.com> phone '
             || lpad(CAST(10 + c_custkey % 90 AS VARCHAR), 2, '0') || '-'
             || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-'
             || lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0') || '-'
             || lpad(CAST((c_custkey * 13) % 10000 AS VARCHAR), 4, '0')
             || ' seg ' || c_mktsegment AS profile
         FROM customer)
       SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
         CAST(len(regexp_extract_all(profile, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(profile, '\d{2}-\d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phones,
         md5(regexp_replace(regexp_replace(profile,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
           '\d{2}-\d{3}-\d{3}-\d{4}', '[PHONE]', 'g')) AS redacted_md5
       FROM prof ORDER BY c_custkey"""

  // ---- q117: unigram-LM cross-entropy quality buckets (CCNet) ----------------

  /** CCNet-style LM-quality bucketing (Wenzek et al. 2020): score each
    * document by its per-token cross-entropy under a unigram LM fit on
    * the corpus itself, then split each LANGUAGE into head/middle/tail at
    * its discrete terciles — the classic three-way quality partition used
    * to curate CommonCrawl (low cross-entropy = fluent/boilerplate-free
    * "head"). Self-fit makes this the repetition/boilerplate signal;
    * production swaps the count table for one fit on a trusted corpus —
    * same joins, same shape.
    *
    * Scale shape: unigram counts are ONE (lang, token) shuffle; totals
    * broadcast (|langs| rows); scoring re-joins tokens to counts on the
    * SAME (lang, token) key; terciles come from a per-lang window over
    * one row per doc (partitioned — never global) and broadcast back,
    * the q109 discrete-threshold recipe. Numeric discipline: every
    * -ln p(tok) is rounded to 1e-6 and cast DECIMAL(18,6) BEFORE the
    * per-doc sum, so the sum is exact integer arithmetic in both engines
    * regardless of partition order (a raw double sum over hundreds of
    * addends is order-sensitive); the per-doc mean is then one r4'd
    * double division. */
  def q117PerplexityBuckets(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tk"))
    val vocab = toks.groupBy("lang", "tk").agg(count(lit(1)).as("cnt"))
    // per-lang token totals straight off the token stream: Σ_tk cnt(lang,
    // tk) ≡ count of tokens per lang, so this is the same number without
    // nesting a second full vocab aggregation under the totals broadcast
    // (r16 before-plan: 18 scans of documents, three of them feeding
    // vocab-for-totals subtrees)
    val totals = toks.groupBy("lang").agg(count(lit(1)).as("tot"))
    // the LM table broadcasts: scoring is then map-side over the token
    // stream (one shuffle builds the counts, one aggregates per doc —
    // the token stream is never re-shuffled on the token key). At corpus
    // scale the table is the frequency-cutoff vocabulary, which is what
    // keeps it broadcast-sized; if it outgrows the budget this join
    // degrades gracefully to the shuffle form by dropping the hint.
    val nll = toks.join(broadcast(vocab), Seq("lang", "tk"))
      .join(broadcast(totals), Seq("lang"))
      .select(col("doc_id"), col("lang"),
        (floor(-log(col("cnt").cast("double") / col("tot").cast("double"))
          * 1000000.0 + 0.5) / 1000000.0).cast("decimal(18,6)").as("nll"))
    // one row per doc — the small decision table (guide §8): materialize
    // it ONCE so the two tercile-threshold branches and the final join
    // read blocks instead of each re-running the corpus scan + LM join +
    // per-doc aggregate (the r16 before-plan evaluated this subtree 3×,
    // 18 document scans in total; after: 2 — vocab and the scoring pass)
    val scored = nll.groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_tokens"), sum(col("nll")).as("nll_sum"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        graft.Stable.r4(col("nll_sum").cast("double")
          / col("n_tokens").cast("double")).as("xent"))
      .localCheckpoint()
    val wr = Window.partitionBy("lang").orderBy(col("xent"), col("doc_id"))
    val ranked = scored
      .withColumn("rn", row_number().over(wr))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("lang")))
    val th = ranked.where(col("rn") === expr("(cnt + 2) div 3"))
      .select(col("lang"), col("xent").as("t1"))
      .join(ranked.where(col("rn") === expr("(2 * cnt + 2) div 3"))
        .select(col("lang"), col("xent").as("t2")), Seq("lang"))
    scored.join(broadcast(th), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("xent"),
        when(col("xent") <= col("t1"), "head")
          .when(col("xent") <= col("t2"), "middle")
          .otherwise("tail").as("bucket"))
      .orderBy("doc_id")
  }

  val q117Oracle: String =
    """WITH toks AS (
         SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tk FROM documents),
       vocab AS (SELECT lang, tk, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
       totals AS (SELECT lang, SUM(cnt) AS tot FROM vocab GROUP BY 1),
       nll AS (
         SELECT t.doc_id, t.lang,
           CAST(floor(-ln(CAST(v.cnt AS DOUBLE) / CAST(s.tot AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS nll
         FROM toks t
         JOIN vocab v ON t.lang = v.lang AND t.tk = v.tk
         JOIN totals s ON t.lang = s.lang),
       scored AS (
         SELECT doc_id, lang, COUNT(*) AS n_tokens,
           floor(CAST(SUM(nll) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS xent
         FROM nll GROUP BY 1, 2),
       ranked AS (
         SELECT lang, doc_id, xent,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY xent, doc_id) AS rn,
           COUNT(*) OVER (PARTITION BY lang) AS cnt
         FROM scored),
       th AS (
         SELECT a.lang, a.xent AS t1, b.xent AS t2
         FROM (SELECT lang, xent FROM ranked WHERE rn = (cnt + 2) // 3) a
         JOIN (SELECT lang, xent FROM ranked WHERE rn = (2 * cnt + 2) // 3) b
           ON a.lang = b.lang)
       SELECT d.doc_id, d.lang, CAST(d.n_tokens AS BIGINT) AS n_tokens, d.xent,
         CASE WHEN d.xent <= t.t1 THEN 'head'
              WHEN d.xent <= t.t2 THEN 'middle' ELSE 'tail' END AS bucket
       FROM scored d JOIN th t ON d.lang = t.lang
       ORDER BY d.doc_id"""

  // ---- q118: deterministic mixture resampling (epoch up/down-sampling) -------

  /** Domain-mixture resampling — the Pile/Dolma "epochs per source" knob:
    * each language carries a target weight w (en 0.5×, zh 2.25×, rest
    * 1.0×, in exact 1/65536 units); every document is emitted
    * floor(w) times plus one more iff its hash bucket clears frac(w), so
    * the realized corpus hits the mixture in expectation with ZERO
    * randomness — the same 16-bit multiplicative-hash recipe as q83's
    * stratified sampler (different multiplier, so the two samplers'
    * decisions are uncorrelated), reproducible across engines and
    * partitionings. Upsampling emits real repeated rows (copy_idx
    * numbers them) because that is what a packing/shuffling stage
    * downstream consumes. Shape: pure projection + explode — zero
    * shuffles before the declared ORDER BY; integer-only, no fp. */
  def q118MixtureResample(s: SparkSession, dir: String): DataFrame = {
    val wInt = when(col("lang") === "en", lit(32768L))
      .when(col("lang") === "zh", lit(147456L)).otherwise(lit(65536L))
    val bucket = pmod(col("doc_id") * lit(48271L), lit(65536L))
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), bucket.as("bucket"), wInt.as("w"))
      .withColumn("n_copies", expr("w div 65536")
        + when(col("bucket") < pmod(col("w"), lit(65536L)), 1L).otherwise(0L))
      .where(col("n_copies") >= 1L)
      .select(col("doc_id"), col("lang"), col("n_copies").cast("long").as("n_copies"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_idx"))
      .select(col("doc_id"), col("lang"), col("n_copies"),
        col("copy_idx").cast("long").as("copy_idx"))
      .orderBy("doc_id", "copy_idx")
  }

  val q118Oracle: String =
    """WITH base AS (
         SELECT doc_id, lang,
           (doc_id * 48271) % 65536 AS bucket,
           CASE WHEN lang = 'en' THEN 32768
                WHEN lang = 'zh' THEN 147456 ELSE 65536 END AS w
         FROM documents),
       cop AS (
         SELECT doc_id, lang,
           w // 65536 + CASE WHEN bucket < w % 65536 THEN 1 ELSE 0 END AS n_copies
         FROM base)
       SELECT c.doc_id, c.lang, CAST(c.n_copies AS BIGINT) AS n_copies,
              CAST(u.copy_idx AS BIGINT) AS copy_idx
       FROM cop c, unnest(generate_series(1, c.n_copies)) AS u(copy_idx)
       WHERE c.n_copies >= 1
       ORDER BY c.doc_id, u.copy_idx"""

  // ---- q119: per-key top-k via the custom TopKPerKey operator ----------------

  /** Top-3 events per user by value — the per-key top-k primitive running
    * on the custom operator ([[graft.plans.TopKPerKey]]: partial bounded
    * heaps → clustered exchange → final heaps) with the rank window
    * numbering only the ≤ 3·|users| survivors. This puts the custom
    * operator itself under the driver's DuckDB hash gate (the ANN
    * queries exercise it behind PQ scoring; here the oracle is the plain
    * windowed-subquery twin, so any retention bug in the heaps — tie
    * handling, boundary k, per-partition merge — flips the hash red
    * directly). Declared columns are raw (no arithmetic), so the compare
    * is fp-hazard-free. */
  def q119TopKPerGroup(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_id").cast("long").as("event_id"),
        col("user_id").cast("long").as("user_id"), col("value"))
    val cut = graft.plans.TopK.perKey(ev, Seq("user_id"),
      Seq(col("value").desc, col("event_id")), 3)
    val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    cut.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select(col("user_id"), col("event_id"), col("value"), col("rn"))
      .orderBy("user_id", "rn")
  }

  val q119Oracle: String =
    """SELECT user_id, event_id, value, CAST(rn AS INT) AS rn FROM (
         SELECT user_id, event_id, value,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY value DESC, event_id) AS rn
         FROM events)
       WHERE rn <= 3 ORDER BY user_id, rn"""

  // ---- q120: deterministic mergeable histogram quantiles ---------------------

  /** Approximate quantiles from an equi-width histogram sketch — the
    * ORDER-EXACT sketch alternative to GK `approx_percentile`:
    * QuantileSummaries' merge is not commutative-exact (which kept q68
    * spec-bounded until round 10 swapped its body for the EXACT
    * binary-search selection, `ops/ExactQuantiles` — GK survives as the
    * documented sketch counterpart), but a fixed-bin histogram
    * is a plain integer vector whose merge is vector addition —
    * commutative, associative, deterministic at any partitioning, and
    * tiny (nBins longs per partition, mergeable map-side). Estimate =
    * linear interpolation inside the bin where the cumulative count
    * crosses q·n, the classic streaming-histogram recipe (same family as
    * NumPy/monitoring-system histogram_quantile). Error is bounded by
    * bin width — set by nBins against the anchored [min, max] range,
    * both derived from the data (broadcast 1-row anchor, the q110
    * pattern — never config). Every step is integer counts + one
    * closed-form interpolation, so the full estimate hash-matches DuckDB
    * with no fp-order hazard; the declared outputs carry the bin
    * diagnostics (bin index, in-bin offset) that make the estimate
    * auditable. */
  def q120HistogramQuantiles(s: SparkSession, dir: String): DataFrame = {
    val nBins = 128
    val ev = t(s, dir, "events").select(col("value"))
    val anchor = ev.agg(min(col("value")).as("lo"), max(col("value")).as("hi"),
      count(lit(1)).as("n"))
    // bin = clamped floor((v - lo) / width); the hi edge lands in the top bin
    val binned = ev.crossJoin(broadcast(anchor))
      .select(least(lit(nBins - 1), floor((col("value") - col("lo"))
        / ((col("hi") - col("lo")) / nBins)).cast("int")).as("bin"),
        col("lo"), col("hi"), col("n"))
      .groupBy("bin", "lo", "hi", "n").agg(count(lit(1)).as("c"))
    val wcum = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = binned.withColumn("cum", sum(col("c")).over(wcum))
      .withColumn("prev", col("cum") - col("c"))
    val qs = Seq(0.5, 0.9, 0.99)
    val rows = qs.map { q =>
      // target rank q*n (double: exact product of integer and literal)
      cum.where(col("cum") >= col("n") * q && col("prev") < col("n") * q)
        .limit(1)
        .select(lit(q).as("q"), col("bin"),
          graft.Stable.r4(col("lo") + ((col("hi") - col("lo")) / nBins)
            * (col("bin") + (col("n") * q - col("prev"))
              / col("c"))).as("estimate"),
          col("c").as("bin_count"), col("prev").as("below_bin"))
    }
    rows.reduce(_ union _).orderBy("q")
  }

  val q120Oracle: String =
    """WITH anchor AS (
         SELECT MIN(value) AS lo, MAX(value) AS hi, COUNT(*) AS n FROM events),
       binned AS (
         SELECT LEAST(127, CAST(floor((value - lo) / ((hi - lo) / 128)) AS INT)) AS bin,
                lo, hi, n
         FROM events CROSS JOIN anchor),
       counted AS (
         SELECT bin, lo, hi, n, COUNT(*) AS c
         FROM binned GROUP BY bin, lo, hi, n),
       cum AS (
         SELECT *, SUM(c) OVER (ORDER BY bin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         FROM counted),
       edged AS (SELECT *, cum - c AS prev FROM cum),
       -- scientific literals: DOUBLE in DuckDB (bare 0.5 would be DECIMAL,
       -- and n*q in decimal arithmetic could disagree with Spark's double
       -- comparison at a bin boundary)
       qt AS (SELECT unnest([5e-1, 9e-1, 99e-2]) AS q)
       SELECT q, bin,
         floor((lo + ((hi - lo) / 128) * (bin + (n * q - prev) / c)) * 10000.0 + 0.5)
           / 10000.0 AS estimate,
         CAST(c AS BIGINT) AS bin_count, CAST(prev AS BIGINT) AS below_bin
       FROM qt JOIN edged ON cum >= n * q AND prev < n * q
       ORDER BY q"""

  // ---- q121: BPE tokenizer vocabulary induction ------------------------------

  /** The first 24 BPE merges learned from the documents corpus
    * ([[graft.ops.Bpe]]): the tokenizer-training op of an LLM data
    * pipeline. Deterministic end to end (exact integer pair counts +
    * total-order argmax), so the merge table is reproducible at any
    * partitioning — committed-fixture oracle like the ANN set, with
    * BpeSpec pinning the classic hand-computed example and the
    * determinism/cross-parallelism contract. */
  def q121BpeMerges(s: SparkSession, dir: String): DataFrame =
    graft.ops.Bpe.merges(t(s, dir, "documents"), "text", nMerges = 24,
        corpusKey = Some(dir))
      .orderBy("rank")

  // ---- q176: retrieval evaluation metrics (P@k / recall@k / MRR / nDCG@k) ----

  /** Ranking-quality evaluation of a retrieval run — the metric battery
    * (precision@10, recall@10, MRR, DCG/nDCG@10) every retriever behind a
    * RAG pipeline is tuned against, and the retriever-side complement of
    * the reference's ANSWER-side metrics (EM `utils.py:316`, token F1
    * `utils.py:318-331`, RougeL — its pipeline scores generations but
    * never the passage ranking they came from; this closes that cell next
    * to q104's BM25 scorer and q42's TF-IDF retriever).
    *
    * Shape: a fixed 6-query × 2-term query set (broadcast literal) turns
    * the corpus into a (qid, doc_id) term-frequency table in ONE
    * tokenize+join pass; the RUN is the per-qid top-10 by (tf-sum DESC,
    * doc_id) — an all-integer score, so the ranking is a total order both
    * engines replay exactly — cut by the custom [[graft.plans.TopKPerKey]]
    * operator (bounded heaps; the row_number that assigns ranks then
    * numbers only the ≤ 10·|Q| survivors, never |Q|·n rows — the q119
    * recipe). QRELS are graded off an independent signal (mintf over the
    * pair: rel 2 when both terms appear ≥ 3×, rel 1 at = 2, else 0), so
    * run order and relevance order genuinely disagree and nDCG lands in
    * (0.80, 1.0) rather than degenerating to 1.
    *
    * Exactness: the nDCG discount 1/log2(rank+1) is the ONLY
    * transcendental in the family, and ranks only ever reach 10 — so the
    * 10 discounts ship as micro-unit BIGINT literals (round(1e9/log2(r+1)),
    * identical digits in both engines) and DCG/IDCG become exact integer
    * dot products: gain ∈ {0,1,3} (2^rel − 1) × disc_n9, summed as
    * BIGINTs. IDCG needs no ideal-ranking sort — it is the closed form
    * Σ disc over the first n2 ranks at gain 3 and the next nrel−n2 at
    * gain 1, computed by crossing the |Q|-row rel-count table with the
    * 10-row discount table. The terminal divisions (recall, MRR = 1/rank,
    * nDCG = dcg/idcg) divide exactly-representable integers — identical
    * IEEE ops in both engines — then floor at 1e-6. Full hash oracle.
    *
    * Scale: one corpus scan (tokenize → broadcast-join the query terms →
    * two map-side-combinable aggregates); everything after the TopKPerKey
    * cut and the rel-count rollup is |Q|-sized. No window ever touches a
    * corpus-sized table; |Q| grows the run cut's key count, not its
    * per-key state. */
  def q176RetrievalMetrics(s: SparkSession, dir: String): DataFrame =
    retrievalMetricsAt10(t(s, dir, "documents"),
      Seq((1L, "spark"), (1L, "join"), (2L, "merge"), (2L, "sort"),
        (3L, "window"), (3L, "agg"), (4L, "hash"), (4L, "scan"),
        (5L, "stream"), (5L, "batch"), (6L, "filter"), (6L, "group")))

  /** Core of [[q176RetrievalMetrics]] over any (doc_id, text) frame —
    * the spec drives it with a hand-sized corpus whose metric values are
    * computed by hand. */
  def retrievalMetricsAt10(docs: DataFrame, qtermPairs: Seq[(Long, String)]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val qterms = qtermPairs.toDF("qid", "term")
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tk"))
    val tf = toks.join(broadcast(qterms), col("tk") === col("term"))
      .groupBy("qid", "doc_id", "term").agg(count(lit(1)).as("c"))
    // relevance grades against the query's OWN term count (the declared
    // set is all-2-term, where this reduces to nterms = 2 — the oracle's
    // spelling — but the core must not silently zero qrels for a caller's
    // 3-term query)
    val qsize = qterms.groupBy("qid").agg(count(lit(1)).as("qn"))
    val dstat = tf.groupBy("qid", "doc_id")
      .agg(count(lit(1)).as("nterms"), min(col("c")).as("mintf"),
        sum(col("c")).as("tfsum"))
      .join(broadcast(qsize), Seq("qid"))
    val qrels = dstat.select(col("qid"), col("doc_id"),
      when(col("nterms") === col("qn") && col("mintf") >= 3, 2)
        .when(col("nterms") === col("qn") && col("mintf") === 2, 1)
        .otherwise(0).as("rel"))
    val cut = graft.plans.TopK.perKey(dstat, Seq("qid"),
      Seq(col("tfsum").desc, col("doc_id")), 10)
    val w = Window.partitionBy("qid").orderBy(col("tfsum").desc, col("doc_id"))
    val run = cut.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 10).select(col("qid"), col("doc_id"), col("rnk"))
    metricsAt10(run, qrels)
  }

  /** The rank-metric tail shared by q176 (tf-sum run) and q179 (BM25
    * run): given a top-10 RUN (qid, doc_id, rnk) and graded QRELS
    * (qid, doc_id, rel ∈ {0,1,2}), produce the per-query metric row.
    * All-integer DCG/IDCG via the micro-unit discount literals; the
    * terminal divisions are exact-integer-operand IEEE ops floored at
    * 1e-6 (see [[q176RetrievalMetrics]]). */
  private def metricsAt10(run: DataFrame, qrels: DataFrame): DataFrame = {
    val s = run.sparkSession
    import s.implicits._
    val r6 = (c: Column) => floor(c * 1000000.0 + 0.5) / 1000000.0
    val disc = Seq((1, 1000000000L), (2, 630929754L), (3, 500000000L),
      (4, 430676558L), (5, 386852807L), (6, 356207187L), (7, 333333333L),
      (8, 315464877L), (9, 301029996L), (10, 289064826L))
      .toDF("rnk", "disc_n9")
    val rels = qrels.withColumnRenamed("qid", "rq").withColumnRenamed("doc_id", "rd")
    val hits = run
      .join(rels, col("qid") === col("rq") && col("doc_id") === col("rd"), "left")
      .select(col("qid"), col("rnk"), coalesce(col("rel"), lit(0)).as("rel"))
    val relcnt = qrels.groupBy("qid").agg(
      sum(when(col("rel") === 2, 1L).otherwise(0L)).as("n2"),
      sum(when(col("rel") >= 1, 1L).otherwise(0L)).as("nrel"))
    val dcg = hits.join(broadcast(disc), Seq("rnk"))
      .groupBy("qid").agg(
        sum(when(col("rel") === 2, 3L).when(col("rel") === 1, 1L).otherwise(0L)
          * col("disc_n9")).as("dcg_n9"),
        sum(when(col("rel") >= 1, 1L).otherwise(0L)).as("hits_at_10"),
        min(when(col("rel") >= 1, col("rnk"))).as("first_rel"))
    val idcg = relcnt.crossJoin(broadcast(disc))
      .groupBy("qid").agg(sum(
        when(col("rnk") <= least(col("n2"), lit(10)), lit(3L) * col("disc_n9"))
          .when(col("rnk") <= least(col("nrel"), lit(10)), col("disc_n9"))
          .otherwise(0L)).as("idcg_n9"))
    // relcnt/idcg are |Q|-row aggregates, but the planner only sees
    // post-aggregation estimates and planned SortMergeJoins here (2
    // exchanges each in the r16 before-plan); |Q| is a caller-bounded
    // query budget at every scale, so the broadcast is safe by
    // construction (guide §3.1: hint when you know a side is small)
    dcg.join(broadcast(relcnt), Seq("qid")).join(broadcast(idcg), Seq("qid"))
      .select(col("qid"), col("nrel").as("n_rel"), col("hits_at_10"),
        r6(col("hits_at_10").cast("double") / 10.0).as("precision_at_10"),
        when(col("nrel") === 0, 0.0)
          .otherwise(r6(col("hits_at_10").cast("double") / col("nrel").cast("double")))
          .as("recall_at_10"),
        when(col("first_rel").isNull, 0.0)
          .otherwise(r6(lit(1.0) / col("first_rel").cast("double"))).as("mrr"),
        col("dcg_n9"),
        when(col("idcg_n9") === 0, 0.0)
          .otherwise(r6(col("dcg_n9").cast("double") / col("idcg_n9").cast("double")))
          .as("ndcg_at_10"))
      .orderBy("qid")
  }

  val q176Oracle: String =
    """WITH q(qid, term) AS (VALUES (CAST(1 AS BIGINT),'spark'),(1,'join'),
         (2,'merge'),(2,'sort'),(3,'window'),(3,'agg'),(4,'hash'),(4,'scan'),
         (5,'stream'),(5,'batch'),(6,'filter'),(6,'group')),
       disc(rnk, disc_n9) AS (VALUES (1,CAST(1000000000 AS BIGINT)),
         (2,630929754),(3,500000000),(4,430676558),(5,386852807),
         (6,356207187),(7,333333333),(8,315464877),(9,301029996),
         (10,289064826)),
       toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tk
                FROM documents),
       tf AS (SELECT q.qid, t.doc_id, t.tk, COUNT(*) AS c
              FROM toks t JOIN q ON t.tk = q.term GROUP BY 1, 2, 3),
       dstat AS (SELECT qid, doc_id, COUNT(*) AS nterms, MIN(c) AS mintf,
                   SUM(c) AS tfsum
                 FROM tf GROUP BY 1, 2),
       qrels AS (SELECT qid, doc_id,
                   CASE WHEN nterms = 2 AND mintf >= 3 THEN 2
                        WHEN nterms = 2 AND mintf = 2 THEN 1 ELSE 0 END AS rel
                 FROM dstat),
       run AS (SELECT qid, doc_id, rnk FROM (
                 SELECT qid, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY tfsum DESC, doc_id) AS rnk
                 FROM dstat) WHERE rnk <= 10),
       hits AS (SELECT r.qid, r.rnk, COALESCE(rel.rel, 0) AS rel
                FROM run r LEFT JOIN qrels rel
                  ON r.qid = rel.qid AND r.doc_id = rel.doc_id),
       relcnt AS (SELECT qid, COUNT(*) FILTER (WHERE rel = 2) AS n2,
                    COUNT(*) FILTER (WHERE rel >= 1) AS nrel
                  FROM qrels GROUP BY 1),
       dcg AS (SELECT h.qid,
                 SUM((CASE h.rel WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END)
                     * d.disc_n9) AS dcg_n9,
                 SUM(CASE WHEN h.rel >= 1 THEN 1 ELSE 0 END) AS hits_at_10,
                 MIN(CASE WHEN h.rel >= 1 THEN h.rnk END) AS first_rel
               FROM hits h JOIN disc d ON h.rnk = d.rnk GROUP BY 1),
       idcg AS (SELECT rc.qid,
                  SUM(CASE WHEN d.rnk <= LEAST(rc.n2, 10) THEN 3 * d.disc_n9
                           WHEN d.rnk <= LEAST(rc.nrel, 10) THEN d.disc_n9
                           ELSE 0 END) AS idcg_n9
                FROM relcnt rc CROSS JOIN disc d GROUP BY 1)
       SELECT g.qid, CAST(rc.nrel AS BIGINT) AS n_rel,
         CAST(g.hits_at_10 AS BIGINT) AS hits_at_10,
         floor(CAST(g.hits_at_10 AS DOUBLE) / 10.0 * 1000000.0 + 0.5)
           / 1000000.0 AS precision_at_10,
         CASE WHEN rc.nrel = 0 THEN 0.0
              ELSE floor(CAST(g.hits_at_10 AS DOUBLE) / CAST(rc.nrel AS DOUBLE)
                         * 1000000.0 + 0.5) / 1000000.0 END AS recall_at_10,
         CASE WHEN g.first_rel IS NULL THEN 0.0
              ELSE floor(1.0 / CAST(g.first_rel AS DOUBLE) * 1000000.0 + 0.5)
                   / 1000000.0 END AS mrr,
         CAST(g.dcg_n9 AS BIGINT) AS dcg_n9,
         CASE WHEN i.idcg_n9 = 0 THEN 0.0
              ELSE floor(CAST(g.dcg_n9 AS DOUBLE) / CAST(i.idcg_n9 AS DOUBLE)
                         * 1000000.0 + 0.5) / 1000000.0 END AS ndcg_at_10
       FROM dcg g JOIN relcnt rc ON g.qid = rc.qid
         JOIN idcg i ON g.qid = i.qid
       ORDER BY g.qid"""

  // ---- q179: end-to-end IR evaluation — retrieval metrics over the BM25 run --

  /** The IR loop closed: q178 builds and serves the lexical index, q176
    * defines the metric battery, and THIS query evaluates the BM25
    * ranking itself — per-query precision@10 / recall@10 / MRR /
    * DCG / nDCG@10 of a multi-query Okapi BM25 run against the same
    * independent mintf-graded qrels q176 uses. The run scores q104's
    * exact per-term expression per (qid, doc), r4-floors the score
    * BEFORE ranking (the ranking key is then an engine-invariant total
    * order with doc_id tie-break; the declared queries are 2-term, so
    * the per-doc double sum is a single commutative addition — exact in
    * both engines), cuts top-10 per qid on [[graft.plans.TopKPerKey]],
    * and feeds the shared integer-DCG tail ([[metricsAt10]]). Full
    * DuckDB hash oracle. Comparing this row set against q176's shows
    * the two rankers genuinely disagree (BM25's tf saturation vs the
    * raw tf-sum: nDCG 0.775–0.958 here vs 0.803–1.0 there). */
  def q179Bm25Eval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qterms = Seq((1L, "spark"), (1L, "join"), (2L, "merge"), (2L, "sort"),
      (3L, "window"), (3L, "agg"), (4L, "hash"), (4L, "scan"),
      (5L, "stream"), (5L, "batch"), (6L, "filter"), (6L, "group"))
      .toDF("qid", "term")
    val docs = t(s, dir, "documents")
    val toksArr = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    val dl = toksArr.select(col("doc_id"), size(col("t")).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val toks = toksArr.select(col("doc_id"), explode(col("t")).as("tk"))
    val tf = toks.join(broadcast(qterms), col("tk") === col("term"))
      .groupBy("qid", "doc_id", "term").agg(count(lit(1)).as("c"))
    val qsize = qterms.groupBy("qid").agg(count(lit(1)).as("qn"))
    val qrels = tf.groupBy("qid", "doc_id")
      .agg(count(lit(1)).as("nterms"), min(col("c")).as("mintf"))
      .join(broadcast(qsize), Seq("qid"))
      .select(col("qid"), col("doc_id"),
        when(col("nterms") === col("qn") && col("mintf") >= 3, 2)
          .when(col("nterms") === col("qn") && col("mintf") === 2, 1)
          .otherwise(0).as("rel"))
    val df = tf.groupBy("qid", "term")
      .agg(countDistinct(col("doc_id")).cast("double").as("df"))
    val scored = tf.join(broadcast(df), Seq("qid", "term"))
      .join(dl, Seq("doc_id")).crossJoin(broadcast(stats))
      .groupBy("qid", "doc_id")
      .agg(graft.Stable.r4(sum(graft.ops.Lexical.bm25Term(
        col("c").cast("double"), col("df"), col("dl"),
        col("n_docs"), col("avgdl")))).as("bm25"))
    val cut = graft.plans.TopK.perKey(scored, Seq("qid"),
      Seq(col("bm25").desc, col("doc_id")), 10)
    val w = Window.partitionBy("qid").orderBy(col("bm25").desc, col("doc_id"))
    val run = cut.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 10).select(col("qid"), col("doc_id"), col("rnk"))
    metricsAt10(run, qrels)
  }

  val q179Oracle: String =
    """WITH q(qid, term) AS (VALUES (CAST(1 AS BIGINT),'spark'),(1,'join'),
         (2,'merge'),(2,'sort'),(3,'window'),(3,'agg'),(4,'hash'),(4,'scan'),
         (5,'stream'),(5,'batch'),(6,'filter'),(6,'group')),
       disc(rnk, disc_n9) AS (VALUES (1,CAST(1000000000 AS BIGINT)),
         (2,630929754),(3,500000000),(4,430676558),(5,386852807),
         (6,356207187),(7,333333333),(8,315464877),(9,301029996),
         (10,289064826)),
       toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks),
       stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl
                 FROM dl),
       tkn AS (SELECT doc_id, unnest(t) AS tk FROM toks),
       tf AS (SELECT q.qid, t.doc_id, t.tk, COUNT(*) AS c
              FROM tkn t JOIN q ON t.tk = q.term GROUP BY 1, 2, 3),
       qrels AS (SELECT d.qid, d.doc_id,
                   CASE WHEN d.nterms = 2 AND d.mintf >= 3 THEN 2
                        WHEN d.nterms = 2 AND d.mintf = 2 THEN 1 ELSE 0
                   END AS rel
                 FROM (SELECT qid, doc_id, COUNT(*) AS nterms, MIN(c) AS mintf
                       FROM tf GROUP BY 1, 2) d),
       df AS (SELECT qid, tk, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
              FROM tf GROUP BY 1, 2),
       scored AS (
         SELECT tf.qid, tf.doc_id,
           floor(SUM( ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                 * CAST(tf.c AS DOUBLE) * 2.2
                 / (CAST(tf.c AS DOUBLE)
                    + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) )
             * 10000.0 + 0.5) / 10000.0 AS bm25
         FROM tf JOIN df ON tf.qid = df.qid AND tf.tk = df.tk
           JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
         GROUP BY 1, 2),
       run AS (SELECT qid, doc_id, rnk FROM (
                 SELECT qid, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY bm25 DESC, doc_id) AS rnk
                 FROM scored) WHERE rnk <= 10),
       hits AS (SELECT r.qid, r.rnk, COALESCE(rel.rel, 0) AS rel
                FROM run r LEFT JOIN qrels rel
                  ON r.qid = rel.qid AND r.doc_id = rel.doc_id),
       relcnt AS (SELECT qid, COUNT(*) FILTER (WHERE rel = 2) AS n2,
                    COUNT(*) FILTER (WHERE rel >= 1) AS nrel
                  FROM qrels GROUP BY 1),
       dcg AS (SELECT h.qid,
                 SUM((CASE h.rel WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END)
                     * d.disc_n9) AS dcg_n9,
                 SUM(CASE WHEN h.rel >= 1 THEN 1 ELSE 0 END) AS hits_at_10,
                 MIN(CASE WHEN h.rel >= 1 THEN h.rnk END) AS first_rel
               FROM hits h JOIN disc d ON h.rnk = d.rnk GROUP BY 1),
       idcg AS (SELECT rc.qid,
                  SUM(CASE WHEN d.rnk <= LEAST(rc.n2, 10) THEN 3 * d.disc_n9
                           WHEN d.rnk <= LEAST(rc.nrel, 10) THEN d.disc_n9
                           ELSE 0 END) AS idcg_n9
                FROM relcnt rc CROSS JOIN disc d GROUP BY 1)
       SELECT g.qid, CAST(rc.nrel AS BIGINT) AS n_rel,
         CAST(g.hits_at_10 AS BIGINT) AS hits_at_10,
         floor(CAST(g.hits_at_10 AS DOUBLE) / 10.0 * 1000000.0 + 0.5)
           / 1000000.0 AS precision_at_10,
         CASE WHEN rc.nrel = 0 THEN 0.0
              ELSE floor(CAST(g.hits_at_10 AS DOUBLE) / CAST(rc.nrel AS DOUBLE)
                         * 1000000.0 + 0.5) / 1000000.0 END AS recall_at_10,
         CASE WHEN g.first_rel IS NULL THEN 0.0
              ELSE floor(1.0 / CAST(g.first_rel AS DOUBLE) * 1000000.0 + 0.5)
                   / 1000000.0 END AS mrr,
         CAST(g.dcg_n9 AS BIGINT) AS dcg_n9,
         CASE WHEN i.idcg_n9 = 0 THEN 0.0
              ELSE floor(CAST(g.dcg_n9 AS DOUBLE) / CAST(i.idcg_n9 AS DOUBLE)
                         * 1000000.0 + 0.5) / 1000000.0 END AS ndcg_at_10
       FROM dcg g JOIN relcnt rc ON g.qid = rc.qid
         JOIN idcg i ON g.qid = i.qid
       ORDER BY g.qid"""

  // ---- q180: BM25 served through INCREMENTAL posting maintenance (CDC) -------

  /** The posting index maintained, not rebuilt — the lexical twin of
    * the graph lifecycle's q174/q175, closing the round-14 gap where
    * any corpus change forced a whole-index rebuild
    * ([[graft.streaming.PostingsMaintenance]] on the shared
    * [[graft.streaming.StateProtocol]] delta-log seam): the corpus is
    * seeded MINUS a held-out slice PLUS a phantom slice, then three CDC
    * batches run against the versioned posting state — the held-out
    * docs arrive (insert), the phantoms retire alongside a small real
    * slice (delete), and that slice REINSERTS with its original text —
    * landing the maintained state exactly on the `documents` table.
    * Serving then folds the full 3-delta chain (insert, tombstone,
    * winning-version reinsert — the hardest read path) and scores with
    * q104's exact IEEE expression, so the query carries q104's full
    * DuckDB hash oracle VERBATIM: maintained state is provably
    * indistinguishable from a rebuild. Per-batch write cost is
    * O(batch tokens), not O(corpus); the term-bucket listing prune
    * survives the fold (PostingsMaintenanceSpec pins it, with
    * compaction parity, replay idempotence, and writer fencing). */
  def q180Bm25Cdc(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    // seed + 3 CDC batches into `stateDir` so the maintained state lands
    // exactly on the `documents` table (see scaladoc above)
    def runCdc(stateDir: String): Unit = {
      val held = pmod(col("doc_id"), lit(5L)) === 3L
      val reins = pmod(col("doc_id"), lit(97L)) === 14L && !held
      // phantom ids: GUARANTEED headroom (max real id + 1 as the
      // offset), not an assumed 1e8 clearance — an SF whose doc_ids
      // cross any fixed constant would otherwise fail the insert-clash
      // require mid-CDC instead of up front
      val phantomOff =
        docs.agg(max(col("doc_id"))).first().getLong(0) + 1L
      val phantoms = docs.where(pmod(col("doc_id"), lit(7L)) === 2L)
        .select((col("doc_id") + phantomOff).as("doc_id"),
          concat(lit("phantom "), col("text")).as("text"))
      graft.streaming.PostingsMaintenance.init(stateDir,
        docs.where(!held).unionByName(phantoms), "doc_id", "text")
      val lease = graft.streaming.PostingsMaintenance.acquireWriter(stateDir)
      def batch(df: DataFrame, id: Long): Unit =
        graft.streaming.PostingsMaintenance.applyBatch(df, id, stateDir,
          compactEvery = 4, lease = Some(lease))
      def dels(d: DataFrame): DataFrame =
        d.select(lit("D").as("op"), col("doc_id"),
          lit(null).cast("string").as("text"))
      batch(docs.where(held)
        .select(lit("I").as("op"), col("doc_id"), col("text")), 0L)
      batch(dels(phantoms).unionByName(dels(docs.where(reins))), 1L)
      batch(docs.where(reins)
        .select(lit("I").as("op"), col("doc_id"), col("text")), 2L)
    }
    def serve(stateDir: String): DataFrame =
      graft.streaming.PostingsMaintenance.bm25Serve(s, stateDir,
        Seq("spark", "join", "merge"), 20).localCheckpoint()
    // scratch fallback: per-invocation temp state, deleted after the
    // serve — the store-disabled path (and the degrade on store failure)
    def scratch(): DataFrame = {
      val stateDir = java.nio.file.Files
        .createTempDirectory("graft-q180").toString
      runCdc(stateDir)
      val out = serve(stateDir)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(stateDir))
      out
    }
    // Amortization (round-15 verdict item 7): the CDC state is a pure
    // function of the corpus, so key it by the ModelStore CONTENT
    // fingerprint and let bench reps (and later JVMs) price the SERVE —
    // the chain fold + BM25 read path — not the protocol replay. The
    // replay cost itself stays measured: q180 rides the bench cold
    // column (coldfit wipes the store and re-runs the full
    // init+3-batches+serve sequence). Store failures degrade to scratch.
    if (!graft.ops.ModelStore.enabled) return scratch()
    val (n, h) = graft.ops.ModelStore.fingerprint(
      docs, col("doc_id"), col("text"))
    val key = s"$dir|q180cdc|v1|n=$n|h=$h"
    def buildAndServe(dest: graft.ops.ModelStore.Loc): DataFrame = {
      val tmp = graft.ops.ModelStore.staging(dest)
      runCdc(tmp.spark)
      graft.ops.ModelStore.publish(tmp, dest)
      serve(dest.spark)
    }
    graft.ops.ModelStore.dirLoc("cdcstate", key) match {
      case Some(dest) if dest.exists =>
        try serve(dest.spark)
        catch { case scala.util.control.NonFatal(_) =>
          graft.ops.ModelStore.drop(dest)
          try buildAndServe(dest)
          catch { case scala.util.control.NonFatal(_) => scratch() }
        }
      case Some(dest) =>
        try buildAndServe(dest)
        catch { case scala.util.control.NonFatal(_) => scratch() }
      case None => scratch()
    }
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q99_binaryfile_source" -> (q99BinaryfileSource _),
    "q100_repetition_signals" -> (q100RepetitionSignals _),
    "q101_zorder_layout" -> (q101ZorderLayout _),
    "q102_semdedup" -> (q102SemDedup _),
    "q103_passage_chunks" -> (q103PassageChunks _),
    "q104_bm25" -> (q104Bm25 _),
    "q105_pagerank" -> (q105PageRank _),
    "q106_label_centroids" -> (q106LabelCentroids _),
    "q107_embedding_norms" -> (q107EmbeddingNorms _),
    "q108_merge_upsert" -> (q108MergeUpsert _),
    "q109_median_filter" -> (q109MedianFilter _),
    "q110_decayed_engagement" -> (q110DecayedEngagement _),
    "q111_avi_demux" -> (q111AviDemux _),
    "q112_adpcm_decode" -> (q112AdpcmDecode _),
    "q113_bilinear_resize" -> (q113BilinearResize _),
    "q114_length_buckets" -> (q114LengthBuckets _),
    "q115_mjpeg_frames" -> (q115MjpegFrames _),
    "q116_pii_redact" -> (q116PiiRedact _),
    "q117_perplexity_buckets" -> (q117PerplexityBuckets _),
    "q118_mixture_resample" -> (q118MixtureResample _),
    "q119_topk_per_group" -> (q119TopKPerGroup _),
    "q120_histogram_quantiles" -> (q120HistogramQuantiles _),
    "q121_bpe_merges" -> (q121BpeMerges _),
    "q176_retrieval_metrics" -> (q176RetrievalMetrics _),
    "q178_bm25_served" -> (q178Bm25Served _),
    "q179_bm25_eval" -> (q179Bm25Eval _),
    "q180_bm25_cdc" -> (q180Bm25Cdc _))

  val oracles: Map[String, String] = Map(
    "q99_binaryfile_source" -> q99Oracle,
    "q100_repetition_signals" -> q100Oracle,
    "q101_zorder_layout" -> q101Oracle,
    "q102_semdedup" -> DataQueries.fixtureOracle("q102_semdedup"),
    "q103_passage_chunks" -> q103Oracle,
    "q104_bm25" -> q104Oracle,
    "q105_pagerank" -> q105Oracle,
    "q106_label_centroids" -> q106Oracle,
    "q107_embedding_norms" -> q107Oracle,
    "q108_merge_upsert" -> q108Oracle,
    "q109_median_filter" -> q109Oracle,
    "q110_decayed_engagement" -> q110Oracle,
    "q111_avi_demux" -> q111Oracle,
    "q112_adpcm_decode" -> q112Oracle,
    "q113_bilinear_resize" -> q113Oracle,
    "q114_length_buckets" -> q114Oracle,
    "q115_mjpeg_frames" -> q115Oracle,
    "q116_pii_redact" -> q116Oracle,
    "q117_perplexity_buckets" -> q117Oracle,
    "q118_mixture_resample" -> q118Oracle,
    "q119_topk_per_group" -> q119Oracle,
    "q120_histogram_quantiles" -> q120Oracle,
    "q121_bpe_merges" -> DataQueries.fixtureOracle("q121_bpe_merges"),
    "q176_retrieval_metrics" -> q176Oracle,
    // the served form recomputes q104's exact expression off the
    // published postings, so the oracle is q104's verbatim
    "q178_bm25_served" -> q104Oracle,
    "q179_bm25_eval" -> q179Oracle,
    // the maintained posting state lands exactly on `documents` after
    // the CDC sequence and serves q104's exact expression, so the
    // oracle is q104's verbatim — same recipe as q178
    "q180_bm25_cdc" -> q104Oracle)
}
