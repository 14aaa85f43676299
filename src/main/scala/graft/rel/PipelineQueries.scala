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

  // ---- registry --------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q122_dup_spans" -> (q122DupSpans _))

  val oracles: Map[String, String] = Map(
    "q122_dup_spans" -> q122Oracle)
}
