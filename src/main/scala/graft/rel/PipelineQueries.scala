package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 training-data-pipeline wave (declared surface, SURVEY §2
  * Part B continuation):
  *
  *   - q122 exact duplicate-span detection (substring-level dedup á la
  *          "Deduplicating Training Data Makes Language Models Better",
  *          Lee et al. 2022): per-document fraction of tokens covered by
  *          a token window that occurs more than once in the corpus.
  *   - q123 interpolated bigram-LM cross-entropy (Jelinek–Mercer
  *          smoothing) — the order-2 extension of q117's unigram scorer.
  *   - q124 k-means cluster assignment (Lloyd, unrolled, integer-exact
  *          micro-unit arithmetic so both engines agree bit-for-bit).
  *   - q125 BPE corpus encoding (applies q121's learned merge table
  *          map-side; deterministic ⇒ committed-fixture oracle).
  *
  * Oracle discipline as in [[Queries]]: BIGINT casts, [[graft.Stable.r4]]
  * rounding, deterministic ORDER BY over a unique key, integer/DECIMAL
  * arithmetic wherever a sum's addend order is not fixed.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---- q122: exact duplicate-span detection (substring dedup) ---------------

  /** Substring-level exact dedup signal (Lee et al. 2022's ExactSubstr,
    * reshaped for a relational engine): hash every L=16-token sliding
    * window (stride 1), call a window "duplicated" when its exact content
    * occurs ≥2 times anywhere in the corpus (other docs OR a repeat in
    * the same doc), and report per document how many tokens are covered
    * by the union of its duplicated windows. Suffix arrays give the same
    * answer with L as a minimum match length; the windowed form is the
    * shuffle-friendly equivalent (fixed key width, no global ordering).
    *
    * Shape: window expansion is per-row (transform+slice+explode, the
    * q103 kernel at stride 1); ONE shuffle groups window instances by
    * content (count over a wt-partitioned window — same exchange a
    * groupBy+join would pay, in a single pass); interval-union coverage
    * is a per-doc sort (LEAD over the doc's ≤n surviving starts), exact
    * integer arithmetic throughout. The declared form shuffles the window
    * TEXT so the DuckDB oracle can replay the grouping byte-for-byte; the
    * 100-TB form shuffles xxhash64/128 fingerprints instead (the q21/q34
    * hash-domain trick, L× smaller rows) at a bounded collision risk the
    * oracle comparison cannot accept.
    */
  def q122DupSpans(s: SparkSession, dir: String): DataFrame =
    dupSpans(t(s, dir, "documents"), L = 16)

  /** Core of q122 over any (doc_id, text) frame — spec entry point. */
  def dupSpans(docs: DataFrame, L: Int): DataFrame = {
    val toks = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn("n", size(col("t")))
    val wins = toks.where(col("n") >= L)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, n - $L),
              k -> struct(k AS k, array_join(slice(t, k + 1, $L), ' ') AS wt))""")).as("w"))
      .select(col("doc_id"), col("w.k").as("k"), col("w.wt").as("wt"))
    val dup = wins
      .withColumn("f", count(lit(1)).over(Window.partitionBy("wt")))
      .where(col("f") > 1)
    // union of [k, k+L-1] intervals per doc: sorted starts, each window
    // contributes min(L, gap to next start); the last contributes L
    val cov = dup
      .withColumn("nk", lead(col("k"), 1).over(
        Window.partitionBy("doc_id").orderBy("k")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_windows"),
        sum(when(col("nk").isNull, lit(L))
          .otherwise(least(lit(L), col("nk") - col("k")))).as("dup_tokens"))
    toks.select(col("doc_id"), col("n")).join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
        coalesce(col("n_dup_windows"), lit(0L)).cast("long").as("n_dup_windows"),
        coalesce(col("dup_tokens"), lit(0L)).cast("long").as("dup_tokens"),
        graft.Stable.r4(coalesce(col("dup_tokens"), lit(0L)).cast("double")
          / col("n").cast("double")).as("dup_frac"))
      .orderBy("doc_id")
  }

  val q122Oracle: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t,
                            len(string_split(text, ' ')) AS n FROM documents),
       w AS (SELECT doc_id, k, array_to_string(t[k+1 : k+16], ' ') AS wt
             FROM toks, unnest(generate_series(0, n - 16)) AS u(k)
             WHERE n >= 16),
       f AS (SELECT doc_id, k, COUNT(*) OVER (PARTITION BY wt) AS f FROM w),
       d AS (SELECT doc_id, k,
               LEAD(k) OVER (PARTITION BY doc_id ORDER BY k) AS nk
             FROM f WHERE f > 1),
       cov AS (SELECT doc_id, COUNT(*) AS n_dup_windows,
                 SUM(CASE WHEN nk IS NULL THEN 16
                          ELSE LEAST(16, nk - k) END) AS dup_tokens
               FROM d GROUP BY 1)
       SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
         CAST(t.n AS BIGINT) AS n_tokens,
         CAST(COALESCE(c.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
         CAST(COALESCE(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
         floor(CAST(COALESCE(c.dup_tokens, 0) AS DOUBLE)
               / CAST(t.n AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS dup_frac
       FROM toks t LEFT JOIN cov c USING (doc_id) ORDER BY doc_id"""

  // ---- q123: interpolated bigram-LM cross-entropy ---------------------------

  /** Order-2 LM quality score: per-document cross-entropy under a
    * Jelinek–Mercer interpolated bigram model fit per language on the
    * corpus itself — p(w2|w1) = λ·c(w1,w2)/c(w1·) + (1−λ)·c(·w2)/T with
    * λ=0.7, all counts derived from the SAME bigram stream (history,
    * continuation, and total counts are marginals of the bigram table,
    * so the model is self-consistent and every factor is exact integer
    * arithmetic until the single ln). The interpolation is what q117's
    * unigram can't see: it penalizes improbable token TRANSITIONS, the
    * stronger fluency/boilerplate signal CCNet-style pipelines move to
    * when the unigram head/tail split saturates.
    *
    * Shape: ONE exchange on (lang,w1,w2) — a window count over the
    * bigram stream — scores every instance; the marginal tables (c1, c2,
    * per-lang totals) aggregate the distinct-bigram table (vocab²-bounded,
    * NOT corpus-bounded) and broadcast back, q117's recipe one order up.
    * At 100 TB the broadcast tables are the frequency-cutoff bigram
    * vocabulary; dropping the hints degrades gracefully to shuffle joins
    * on the same keys. Numeric discipline: each −ln p is rounded to 1e-6
    * and cast DECIMAL(18,6) BEFORE the per-doc sum (order-free exact),
    * one r4'd double division at the end.
    */
  def q123BigramLm(s: SparkSession, dir: String): DataFrame =
    bigramXent(t(s, dir, "documents"), lambda = 0.7)

  /** Core of q123 over any (doc_id, lang, text) frame — spec entry point. */
  def bigramXent(docs: DataFrame, lambda: Double): DataFrame = {
    val bi = docs
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("t"))
      .withColumn("n", size(col("t")))
      .where(col("n") >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
        """transform(sequence(0, n - 2),
             i -> struct(t[i] AS w1, t[i + 1] AS w2))""")).as("b"))
      .select(col("doc_id"), col("lang"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = bi.groupBy("lang", "w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("lang", "w1").agg(sum(col("c12")).as("c1"))
    val c2 = c12.groupBy("lang", "w2").agg(sum(col("c12")).as("c2"))
    val tot = c12.groupBy("lang").agg(sum(col("c12")).as("tot"))
    val nll = bi
      .join(broadcast(c12), Seq("lang", "w1", "w2"))
      .join(broadcast(c1), Seq("lang", "w1"))
      .join(broadcast(c2), Seq("lang", "w2"))
      .join(broadcast(tot), Seq("lang"))
      .select(col("doc_id"), col("lang"),
        (floor(-log(lit(lambda) * (col("c12").cast("double") / col("c1").cast("double"))
            + lit(1.0 - lambda) * (col("c2").cast("double") / col("tot").cast("double")))
          * 1000000.0 + 0.5) / 1000000.0).cast("decimal(18,6)").as("nll"))
    nll.groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll")).as("nll_sum"))
      .select(col("doc_id"), col("lang"), col("n_bigrams").cast("long").as("n_bigrams"),
        graft.Stable.r4(col("nll_sum").cast("double")
          / col("n_bigrams").cast("double")).as("xent2"))
      .orderBy("doc_id")
  }

  val q123Oracle: String =
    """WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t,
                            len(string_split(text, ' ')) AS n FROM documents),
       bi AS (SELECT doc_id, lang, t[i+1] AS w1, t[i+2] AS w2
              FROM toks, unnest(generate_series(0, n - 2)) AS u(i)
              WHERE n >= 2),
       c12 AS (SELECT lang, w1, w2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2, 3),
       c1 AS (SELECT lang, w1, SUM(c12) AS c1 FROM c12 GROUP BY 1, 2),
       c2 AS (SELECT lang, w2, SUM(c12) AS c2 FROM c12 GROUP BY 1, 2),
       tot AS (SELECT lang, SUM(c12) AS tot FROM c12 GROUP BY 1),
       nll AS (
         SELECT bi.doc_id, bi.lang,
           CAST(floor(-ln(
               CAST(0.7 AS DOUBLE) * (CAST(c12.c12 AS DOUBLE) / CAST(c1.c1 AS DOUBLE))
             + CAST(0.3 AS DOUBLE) * (CAST(c2.c2 AS DOUBLE) / CAST(tot.tot AS DOUBLE)))
             * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS nll
         FROM bi
         JOIN c12 ON bi.lang = c12.lang AND bi.w1 = c12.w1 AND bi.w2 = c12.w2
         JOIN c1 ON bi.lang = c1.lang AND bi.w1 = c1.w1
         JOIN c2 ON bi.lang = c2.lang AND bi.w2 = c2.w2
         JOIN tot ON bi.lang = tot.lang)
       SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         floor(CAST(SUM(nll) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               * 10000.0 + 0.5) / 10000.0 AS xent2
       FROM nll GROUP BY doc_id, lang ORDER BY doc_id"""

  // ---- registry --------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q122_dup_spans" -> (q122DupSpans _),
    "q123_bigram_lm" -> (q123BigramLm _))

  val oracles: Map[String, String] = Map(
    "q122_dup_spans" -> q122Oracle,
    "q123_bigram_lm" -> q123Oracle)
}
