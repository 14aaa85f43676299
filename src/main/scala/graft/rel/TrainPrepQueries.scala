package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 training-prep wave (declared surface, SURVEY §2 Part B
  * continuation) — the three batch steps between a curated corpus and a
  * training run that the existing surface did not yet name:
  *
  *   - q137 fixed-length sequence packing: concatenate each source's
  *          documents (plus one EOS separator each) and chunk the stream
  *          every L tokens — the GPT-style "pack to context length" step,
  *          with the per-document boundary bookkeeping (first sequence,
  *          offset, spans) that attention-masking needs downstream.
  *   - q138 quota sampling: cap every (source, lang) cell at K documents
  *          chosen by a deterministic hash priority — the "cap domain X
  *          at N docs" curation knob (vs q83's per-language RATES and
  *          q118's epoch upsampling).
  *   - q139 split-leakage audit: after a deterministic train/eval split,
  *          report every cross-split pair of near-duplicate documents
  *          (3-gram Jaccard ≥ τ) — the post-split contamination check
  *          that catches eval answers hiding in the training set (the
  *          fuzzy counterpart of q94's exact-shingle decontamination).
  *
  * Oracle discipline as in [[Queries]]: BIGINT casts everywhere, r4
  * rounding of the one terminal division, deterministic ORDER BY over a
  * unique key, integer arithmetic for everything the hash gate sums.
  */
object TrainPrepQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---- q137: fixed-length sequence packing ----------------------------------

  /** Pack each source's documents into L=512-token training sequences:
    * documents concatenate in doc_id order, each followed by one EOS
    * separator token; the stream chunks every L tokens and a document may
    * SPAN chunk boundaries (unlike q82, which assigns whole docs to the
    * shard where they begin). Declared output per document: its token
    * count, the sequence its first token lands in, the offset inside that
    * sequence, and how many sequences it spans — the boundary metadata a
    * data loader needs to build attention masks over packed sequences.
    *
    * Scale shape: ONE window shuffle partitioned by source (per-source
    * running token total, in-partition sort by doc_id) — never a
    * corpus-wide unpartitioned window; every derived column is pure
    * integer projection arithmetic off the running total. Per-source
    * streams are the production layout anyway (shards pack per domain,
    * then q134 interleaves them); a genuinely global stream at 100 TB
    * would use the same two-phase scan with repartitionByRange providing
    * the partition prefix sums.
    */
  def q137SequencePack(s: SparkSession, dir: String): DataFrame =
    sequencePack(t(s, dir, "documents"), L = 512L)

  /** Core of q137 over any (doc_id, source, text) frame — spec/library
    * entry point. */
  def sequencePack(docs: DataFrame, L: Long): DataFrame = {
    val d = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("cum", sum(col("n_tokens") + lit(1L)).over(w))
      .withColumn("st", col("cum") - col("n_tokens") - lit(1L))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr(s"st div $L").as("first_seq"),
        (col("st") % lit(L)).as("first_off"),
        (expr(s"(st + n_tokens - 1) div $L") - expr(s"st div $L") + lit(1L))
          .as("n_seqs"))
      .orderBy("doc_id")
  }

  val q137Oracle: String =
    """WITH d AS (SELECT doc_id, source,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                  FROM documents),
       c AS (SELECT doc_id, source, n_tokens,
               CAST(SUM(n_tokens + 1) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 - n_tokens - 1 AS st
             FROM d)
       SELECT doc_id, source, n_tokens,
              st // 512 AS first_seq,
              st % 512 AS first_off,
              (st + n_tokens - 1) // 512 - st // 512 + 1 AS n_seqs
       FROM c ORDER BY doc_id"""

  // ---- q138: per-(source, lang) quota sampling ------------------------------

  /** Cap every (source, lang) cell at K=3 documents, chosen by a
    * deterministic multiplicative-hash priority ((doc_id·69069) mod 2^16,
    * Marsaglia's LCG multiplier — distinct from q83's 40503, q118's
    * 48271, q132's 25173 and q139's 69621, so the quota's keep decisions
    * are uncorrelated with every other sampler's; sharing q118's
    * multiplier, say, would make the quota preferentially keep exactly
    * the documents the resampler upsamples) with doc_id as the
    * total-order tie-break. Like q83 this is a pure
    * function of the row, so the kept set is reproducible across engines,
    * partitionings and reruns; unlike q83 (per-language RATES) it bounds
    * each cell's absolute COUNT — the "at most N docs per domain" knob.
    *
    * Scale shape: one window shuffle on (source, lang) + in-partition
    * sort. This is exactly the `row_number() OVER (PARTITION BY ...) <= k`
    * idiom [[graft.plans.InferTopKFromRankFilter]] rewrites: under
    * GraftExtensions the filter never materializes rank for the dropped
    * rows — partial per-partition heaps bound the exchange at keys×K rows
    * (plan-pinned in TrainPrepQueriesSpec). The declared form keeps the
    * window so the rank column itself is oracle-checked.
    */
  def q138QuotaSample(s: SparkSession, dir: String): DataFrame =
    quotaSample(t(s, dir, "documents"), cap = 3)

  /** Core of q138 over any (doc_id, source, lang) frame — spec/library
    * entry point. */
  def quotaSample(docs: DataFrame, cap: Int): DataFrame = {
    val pri = pmod(col("doc_id") * lit(69069L), lit(65536L))
    val w = Window.partitionBy("source", "lang").orderBy(col("pri"), col("doc_id"))
    docs
      .select(col("doc_id"), col("source"), col("lang"), pri.as("pri"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= cap)
      .orderBy("doc_id")
  }

  val q138Oracle: String =
    """SELECT doc_id, source, lang, (doc_id * 69069) % 65536 AS pri,
              CAST(ROW_NUMBER() OVER (PARTITION BY source, lang
                ORDER BY (doc_id * 69069) % 65536, doc_id) AS BIGINT) AS rk
       FROM documents
       QUALIFY rk <= 3
       ORDER BY doc_id"""

  // ---- q139: train/eval split-leakage audit ---------------------------------

  /** Post-split contamination audit: split the corpus 90/10 into train
    * and eval by a deterministic hash ((doc_id·69621) mod 2^16 < 6554 ⇒
    * eval), then report every (eval, train) pair whose 3-gram Jaccard
    * similarity is ≥ 0.5 — near-duplicates of eval documents sitting in
    * the training set, i.e. leaked benchmark data that q94's EXACT
    * 5-gram membership probe would miss once a few tokens drift. Output:
    * the offending pair and its similarity.
    *
    * Scale shape: the eval side is benchmark-sized (bounded, here 10%
    * but in production a fixed eval suite), so its distinct shingle
    * postings BROADCAST and the train stream probes them map-side —
    * q94's decontamination shape with Jaccard scoring stacked on top.
    * The only exchanges are the per-pair intersection count and the
    * per-doc size aggregate; candidate pairs ∝ shared shingles, never
    * eval×train. At extreme eval sizes the broadcast degrades gracefully
    * to a shuffle join on the shingle key (drop the hint).
    */
  def q139SplitLeakage(s: SparkSession, dir: String): DataFrame =
    splitLeakage(t(s, dir, "documents"), n = 3, tau = 0.5)

  /** Core of q139 over any (doc_id, text) frame — spec/library entry
    * point. */
  def splitLeakage(docs: DataFrame, n: Int, tau: Double): DataFrame = {
    val posts = docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
      .withColumn("nn", size(col("tk")))
      .where(col("nn") >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, nn - $n), k -> array_join(slice(tk, k + 1, $n), ' '))")).as("s"))
      .distinct()
      .withColumn("h", pmod(col("doc_id") * lit(69621L), lit(65536L)))
      // materialize once: sizes, the eval side and the train side all read
      // this corpus-sized table — without the checkpoint each consumer
      // replays the shingle explode (the q126/q130 postings discipline)
      .localCheckpoint()
    val sizes = posts.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val ev = posts.where(col("h") < 6554L).select(col("doc_id").as("d_eval"), col("s"))
    val tr = posts.where(col("h") >= 6554L).select(col("doc_id").as("d_train"), col("s"))
    broadcast(ev).join(tr, "s")
      .groupBy("d_eval", "d_train").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("d_eval"), col("sz").as("sz1")), "d_eval")
      .join(sizes.select(col("doc_id").as("d_train"), col("sz").as("sz2")), "d_train")
      .withColumn("_j", col("inter").cast("double")
        / (col("sz1") + col("sz2") - col("inter")).cast("double"))
      .where(col("_j") >= tau)
      .select(col("d_eval"), col("d_train"), graft.Stable.r4(col("_j")).as("jaccard"))
      .orderBy("d_eval", "d_train")
  }

  val q139Oracle: String =
    """WITH toks AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
         FROM documents),
       sh AS (
         SELECT doc_id, tok || ' ' || lead(tok) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
         FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       dt AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE shingle IS NOT NULL),
       sizes AS (SELECT doc_id, COUNT(*) AS sz FROM dt GROUP BY doc_id),
       pairs AS (
         SELECT e.doc_id AS d_eval, tr.doc_id AS d_train, COUNT(*) AS inter
         FROM dt e JOIN dt tr ON e.shingle = tr.shingle
         WHERE (e.doc_id * 69621) % 65536 < 6554
           AND (tr.doc_id * 69621) % 65536 >= 6554
         GROUP BY 1, 2)
       SELECT d_eval, d_train,
              floor((inter * 1.0 / (s1.sz + s2.sz - inter)) * 10000.0 + 0.5) / 10000.0 AS jaccard
       FROM pairs JOIN sizes s1 ON d_eval = s1.doc_id JOIN sizes s2 ON d_train = s2.doc_id
       WHERE inter * 1.0 / (s1.sz + s2.sz - inter) >= 0.5
       ORDER BY d_eval, d_train"""

  // ---- q140: cluster-balanced resampling ------------------------------------

  /** Topic balancing — the cluster-level counterpart of q118's per-source
    * mixture knob: assign every embedding to a k-means cluster (q124's
    * integer-exact Lloyd, k=8 ×2 iterations), then upsample each cluster
    * toward the LARGEST cluster's mass — weight w_c = max_size/size_c in
    * exact 1/65536 units, capped at 4× (the standard repetition cap), and
    * every vector emits floor(w_c) copies plus one more iff its 16-bit hash
    * bucket clears frac(w_c). The emitted multiset equalizes cluster mass
    * in expectation with ZERO randomness — reproducible across engines
    * and partitionings, like q118/q83. This is the "balance topical
    * clusters before training" step (cf. cluster-based data curation à la
    * SemDeDup/D4): rare-topic documents repeat, dominant-topic mass is
    * left intact (never downsampled — compose q138/q83 for caps).
    *
    * Scale shape: the Lloyd front half carries q124's audit (model-sized
    * driver state, broadcast centroids); cluster sizes are k rows, the
    * max is 1 row, and both BROADCAST back into the corpus-sized
    * assignment stream (plan-pinned) — the copy expansion is then a pure
    * projection + explode, zero extra shuffles before the declared
    * ORDER BY.
    */
  def q140ClusterBalance(s: SparkSession, dir: String): DataFrame = {
    val asg = PipelineQueries.kmeansAssign(t(s, dir, "embeddings"), k = 8, iters = 2)
      .select(col("vec_id"), col("cluster"))
    val sizes = asg.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
    val mx = sizes.agg(max(col("cluster_size")).as("m"))
    val wt = sizes.crossJoin(broadcast(mx))
      .select(col("cluster"), col("cluster_size"),
        least(expr("(m * 65536) div cluster_size"), lit(262144L)).as("w"))
    asg.join(broadcast(wt), "cluster")
      .withColumn("n_copies", expr("w div 65536")
        + when(pmod(col("vec_id") * lit(16807L), lit(65536L))
            < pmod(col("w"), lit(65536L)), 1L).otherwise(0L))
      .where(col("n_copies") >= 1L)
      .select(col("vec_id"), col("cluster"), col("cluster_size"),
        col("n_copies").cast("long").as("n_copies"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_idx"))
      .select(col("vec_id"), col("cluster"), col("cluster_size"),
        col("n_copies"), col("copy_idx").cast("long").as("copy_idx"))
      .orderBy("vec_id", "copy_idx")
  }

  /** q124's committed Lloyd CTE chain, re-used verbatim (spliced out of
    * [[PipelineQueries.q124Oracle]] so the two oracles cannot drift),
    * with the balance/resample tail stacked on top. */
  val q140Oracle: String = {
    val lloyd = PipelineQueries.q124Oracle
    val cut = lloyd.lastIndexOf("SELECT vec_id, CAST(cl AS BIGINT)")
    val ctes = lloyd.substring(lloyd.indexOf("WITH") + 5, cut).trim
    s"""WITH $ctes,
       asg AS (SELECT vec_id, CAST(cl AS BIGINT) AS cluster FROM (
                 SELECT vec_id, cl,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
                 FROM d3) WHERE rn = 1),
       cs AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
              FROM asg GROUP BY cluster),
       mx AS (SELECT MAX(cluster_size) AS m FROM cs),
       wt AS (SELECT cluster, cluster_size,
                LEAST((m * 65536) // cluster_size, 262144) AS w
              FROM cs, mx),
       cop AS (SELECT a.vec_id, a.cluster, w.cluster_size,
                 w.w // 65536
                   + CASE WHEN (a.vec_id * 16807) % 65536 < w.w % 65536
                          THEN 1 ELSE 0 END AS n_copies
               FROM asg a JOIN wt w USING (cluster))
       SELECT vec_id, cluster, cluster_size,
              CAST(n_copies AS BIGINT) AS n_copies,
              CAST(u.copy_idx AS BIGINT) AS copy_idx
       FROM cop, unnest(generate_series(1, n_copies)) AS u(copy_idx)
       WHERE n_copies >= 1
       ORDER BY vec_id, copy_idx"""
  }

  // ---- q141: corpus drift (population stability index) ----------------------

  /** Drift monitoring between two corpus snapshots — the standard
    * PSI metric every production data pipeline alarms on: per source,
    * bucket documents by token-count band and compare the two snapshots'
    * band distributions, PSI = Σ_b (pA_b − pB_b)·ln(pA_b/pB_b). PSI < 0.1
    * is conventionally "stable", > 0.25 "shifted". Snapshots here are the
    * deterministic halves of a 16-bit hash split (multiplier 37117,
    * distinct from every sampler in the catalog); production points the
    * same core at yesterday's and today's partitions.
    *
    * Exactness contract (the q117/q136 recipe): counts are exact BIGINTs,
    * probabilities stay RATIONAL (Laplace +1 over the FULL 8-band lattice —
    * densified, so a band empty in both snapshots still contributes its
    * term whenever na != nb), the ln of the cross-ratio is micro-rounded once
    * (floor(ln·1e6 + 0.5) — both engines feed ln the same exact-integer
    * ratio), each band term is an exact DECIMAL product, and the per-
    * source sum is order-free DECIMAL addition with ONE final double
    * division (identical operands both engines) rounded r4.
    *
    * Scale shape: one (source, band, snapshot) count aggregate — the
    * grouped table is |sources|·8·2 rows at any corpus size; the PSI
    * fold is an aggregate over that bounded table, never the corpus.
    * At extreme counts the DECIMAL(38) band product absorbs what BIGINT
    * arithmetic would overflow. */
  def q141CorpusDrift(s: SparkSession, dir: String): DataFrame =
    corpusDrift(t(s, dir, "documents"))

  /** Core of q141 over any (doc_id, source, text) frame. */
  def corpusDrift(docs: DataFrame): DataFrame = {
    val d = docs
      .withColumn("nt", size(split(col("text"), " ")).cast("long"))
      .select(col("doc_id"), col("source"),
        least(expr("nt div 32"), lit(7L)).as("band"),
        (pmod(col("doc_id") * lit(37117L), lit(65536L)) < 32768L).as("in_a"))
    val observed = d.groupBy("source", "band")
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("in_a"), 0L).otherwise(1L)).as("cb"))
    // densify to the full source x 8-band lattice: a band empty in BOTH
    // snapshots still contributes its Laplace term whenever na != nb —
    // dropping it understated the documented +1-over-8-bands metric
    // (review finding, round 9)
    val counts = observed.select("source").distinct()
      .select(col("source"), explode(expr("sequence(0L, 7L)")).as("band"))
      .join(observed, Seq("source", "band"), "left")
      .select(col("source"), col("band"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    // totals are an exact rollup of the bounded counts table — no second
    // corpus scan
    val totals = counts.groupBy("source")
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    counts.join(totals, "source")
      .withColumn("num", (col("ca") + 1L) * (col("nb") + 8L))
      .withColumn("den", (col("cb") + 1L) * (col("na") + 8L))
      .withColumn("li", expr(
        """cast(floor(ln(cast(num as double) / cast(den as double))
             * 1000000.0 + 0.5) as bigint)"""))
      .withColumn("term", (col("num") - col("den")).cast("decimal(38,0)")
        * col("li"))
      .groupBy("source")
      .agg(min(col("na")).as("n_a"), min(col("nb")).as("n_b"),
        sum(col("term")).as("tsum"))
      .select(col("source"), col("n_a"), col("n_b"),
        graft.Stable.r4(col("tsum").cast("double")
          / ((col("n_a") + 8L) * (col("n_b") + 8L)).cast("double")
          / lit(1000000.0)).as("psi"))
      .orderBy("source")
  }

  val q141Oracle: String =
    """WITH d AS (SELECT doc_id, source,
           LEAST(CAST(len(string_split(text, ' ')) AS BIGINT) // 32, 7) AS band,
           (doc_id * 37117) % 65536 < 32768 AS in_a
         FROM documents),
       observed AS (SELECT source, band,
           CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
           CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
         FROM d GROUP BY 1, 2),
       lat AS (SELECT DISTINCT source FROM observed),
       bands AS (SELECT l.source, u.band
                 FROM lat l, unnest(generate_series(0, 7)) AS u(band)),
       counts AS (SELECT b.source, b.band,
           CAST(COALESCE(o.ca, 0) AS BIGINT) AS ca,
           CAST(COALESCE(o.cb, 0) AS BIGINT) AS cb
         FROM bands b LEFT JOIN observed o USING (source, band)),
       totals AS (SELECT source, CAST(SUM(ca) AS BIGINT) AS na,
                    CAST(SUM(cb) AS BIGINT) AS nb
                  FROM counts GROUP BY 1),
       terms AS (SELECT c.source, t.na, t.nb,
           (c.ca + 1) * (t.nb + 8) AS num,
           (c.cb + 1) * (t.na + 8) AS den
         FROM counts c JOIN totals t USING (source)),
       li AS (SELECT source, na, nb, num, den,
           CAST(floor(ln(CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
             * 1000000.0 + 0.5) AS BIGINT) AS l
         FROM terms)
       SELECT source, MIN(na) AS n_a, MIN(nb) AS n_b,
         floor(CAST(SUM(CAST(num - den AS DECIMAL(38,0)) * l) AS DOUBLE)
               / CAST((MIN(na) + 8) * (MIN(nb) + 8) AS DOUBLE)
               / 1000000.0 * 10000.0 + 0.5) / 10000.0 AS psi
       FROM li GROUP BY source
       ORDER BY source"""

  // ---- q154: UniMax language-budget allocation ------------------------------

  /** UniMax (Chung et al. 2023) language sampling: given a total token
    * budget B (here 5·total/2 — budgets run past one corpus epoch, which is why an epoch cap exists at all) and a per-language epoch cap E=3, allocate
    * budget to languages in ASCENDING size order — each language gets
    * min(its full E-epoch demand, an equal share of what remains) — so
    * low-resource languages are repeated up to the cap before
    * high-resource ones eat the budget. The standard fix for
    * temperature-sampling's failure mode (either starving tail languages
    * or over-repeating them past the cap). Output per language: exact
    * token count, allocated budget, r4 achieved epochs.
    *
    * Exactness contract: the waterfill is ALL-INTEGER (floor division of
    * the remaining budget by languages left), so both engines replay the
    * identical trajectory; the one double division (alloc/cnt, identical
    * operands) is terminal and r4'd.
    *
    * Scale shape: ONE corpus pass (the per-language token-count
    * aggregate, map-side combinable); the sequential waterfill runs on
    * the |langs|-row table as bounded driver state — the q124/q128
    * model-sized-state pattern (a language catalog, like a centroid set,
    * is orders of magnitude below any distribution threshold). The
    * DuckDB twin replays the same recurrence as a recursive CTE. */
  def q154UnimaxAlloc(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "documents")
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("lang").agg(sum(col("n")).as("cnt"))
    unimaxAlloc(s, counts, epochCap = 3L)
  }

  /** Core of q154 over any (lang, cnt) frame — spec/library entry point.
    * Budget = 5·Σcnt / 2 (integer), processed smallest-first with (cnt,
    * lang) total order. */
  def unimaxAlloc(s: SparkSession, counts: DataFrame, epochCap: Long): DataFrame = {
    // |langs|-row driver state — bounded by the language catalog
    val rows = counts.collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (l, c) => (c, l) }
    val total = rows.map(_._2).sum
    var remaining = total * 5 / 2
    val out = rows.zipWithIndex.map { case ((lang, c), i) =>
      val a = math.min(c * epochCap, remaining / (rows.length - i))
      remaining -= a
      (lang, c, a)
    }
    import s.implicits._
    out.toSeq.toDF("lang", "n_tokens", "alloc")
      .select(col("lang"), col("n_tokens"), col("alloc"),
        graft.Stable.r4(col("alloc").cast("double") / col("n_tokens").cast("double"))
          .as("epochs"))
      .orderBy("lang")
  }

  /** Recursive-CTE twin of the integer waterfill (UNION ALL recursion —
    * the form Spark 4 also runs, see the q112 precedent). */
  val q154Oracle: String =
    """WITH RECURSIVE cnt AS (
         SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS cnt
         FROM documents GROUP BY lang),
       tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
                      CAST(COUNT(*) AS BIGINT) AS nl FROM cnt),
       ord AS (SELECT lang, cnt,
                 CAST(ROW_NUMBER() OVER (ORDER BY cnt, lang) AS BIGINT) AS rn
               FROM cnt),
       alloc(rn, lang, cnt, a, remaining) AS (
         SELECT o.rn, o.lang, o.cnt,
           LEAST(o.cnt * 3, (t.total * 5 // 2) // t.nl),
           (t.total * 5 // 2) - LEAST(o.cnt * 3, (t.total * 5 // 2) // t.nl)
         FROM ord o CROSS JOIN tot t WHERE o.rn = 1
         UNION ALL
         SELECT o.rn, o.lang, o.cnt,
           LEAST(o.cnt * 3, p.remaining // (t.nl - p.rn)),
           p.remaining - LEAST(o.cnt * 3, p.remaining // (t.nl - p.rn))
         FROM alloc p JOIN ord o ON o.rn = p.rn + 1 CROSS JOIN tot t)
       SELECT lang, cnt AS n_tokens, a AS alloc,
         floor(CAST(a AS DOUBLE) / CAST(cnt AS DOUBLE) * 10000.0 + 0.5)
           / 10000.0 AS epochs
       FROM alloc ORDER BY lang"""

  // ---- q166: temperature-scaled mixture weights ------------------------------

  /** Temperature-scaled sampling weights — the pre-UniMax standard
    * (multilingual BERT/XLM-R: p_i ∝ cnt_i^(1/T), here T = 2, i.e.
    * square-root scaling) that q154 fixes the failure modes of; shipped
    * alongside it so a user can A/B the two allocators. Output per
    * language: exact token count, the r4 sampling share, and the r4
    * implied epochs at a one-corpus-epoch token budget (share·total /
    * cnt — the over/under-sampling factor the temperature buys).
    *
    * Exactness contract: cnt^(1/2) is IEEE sqrt (correctly rounded, so
    * bit-identical in both engines — the q159 precedent), micro-rounded
    * to a BIGINT BEFORE the share sum, so the denominator is an exact
    * integer; shares and epochs are r4'd terminal divisions.
    *
    * Scale shape: one map-side-combinable (lang) aggregate; everything
    * after runs on the |langs|-row table with the 1-row totals
    * broadcast back (the q147/q164 pattern). */
  def q166TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "documents")
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("lang").agg(sum(col("n")).as("cnt"))
      .withColumn("sq", expr("CAST(floor(sqrt(CAST(cnt AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"))
    val totals = counts.agg(sum(col("sq")).as("sq_tot"), sum(col("cnt")).as("n_tot"))
    counts.crossJoin(broadcast(totals))
      .select(col("lang"), col("cnt").cast("long").as("n_tokens"),
        graft.Stable.r4(col("sq").cast("double") / col("sq_tot").cast("double"))
          .as("share"),
        graft.Stable.r4(col("sq").cast("double") / col("sq_tot").cast("double")
          * col("n_tot").cast("double") / col("cnt").cast("double")).as("epochs"))
      .orderBy("lang")
  }

  /** Verbatim-shape twin (IEEE sqrt + micro-rounding both sides). */
  val q166Oracle: String =
    """WITH cnt AS (SELECT lang,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS cnt
         FROM documents GROUP BY lang),
       sq AS (SELECT lang, cnt,
           CAST(floor(sqrt(CAST(cnt AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS sq
         FROM cnt),
       tot AS (SELECT CAST(SUM(sq) AS BIGINT) AS sq_tot,
                      CAST(SUM(cnt) AS BIGINT) AS n_tot FROM sq)
       SELECT lang, cnt AS n_tokens,
         floor(CAST(sq AS DOUBLE) / CAST(sq_tot AS DOUBLE) * 10000.0 + 0.5)
           / 10000.0 AS share,
         floor(CAST(sq AS DOUBLE) / CAST(sq_tot AS DOUBLE)
           * CAST(n_tot AS DOUBLE) / CAST(cnt AS DOUBLE) * 10000.0 + 0.5)
           / 10000.0 AS epochs
       FROM sq CROSS JOIN tot
       ORDER BY lang"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q137_sequence_pack" -> (q137SequencePack _),
    "q138_quota_sample" -> (q138QuotaSample _),
    "q139_split_leakage" -> (q139SplitLeakage _),
    "q140_cluster_balance" -> (q140ClusterBalance _),
    "q141_corpus_drift" -> (q141CorpusDrift _),
    "q154_unimax_alloc" -> (q154UnimaxAlloc _),
    "q166_temperature_mix" -> (q166TemperatureMix _))

  val oracles: Map[String, String] = Map(
    "q137_sequence_pack" -> q137Oracle,
    "q138_quota_sample" -> q138Oracle,
    "q139_split_leakage" -> q139Oracle,
    "q140_cluster_balance" -> q140Oracle,
    "q141_corpus_drift" -> q141Oracle,
    "q154_unimax_alloc" -> q154Oracle,
    "q166_temperature_mix" -> q166Oracle)
}
