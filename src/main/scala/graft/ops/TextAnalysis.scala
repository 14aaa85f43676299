package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis operators for training-data pipelines (SURVEY B24 +
  * driver contract extensions: language-ID, quality scoring, token
  * counting, fingerprinting). No counterpart in the reference beyond its
  * scoring kernels; all per-row column expressions (embarrassingly
  * parallel, no shuffle) except the corpus-level aggregations.
  */
object TextAnalysis {

  /** Whitespace token count (codegen'd — no UDF). */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish subword count estimate: word-boundary pieces plus intra-word
    * splits every 4 chars — a deterministic proxy for tokenizer cost
    * models (real BPE tables are model-specific; the Spark-side shape —
    * a scalar projection — is identical). ceil(len/4) per word. */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(transform(split(text, " "), w => ceil(length(w) / lit(4.0)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** ASCII punctuation ratio ∈ [0,1], 4-decimal rounded. */
  def punctRatio(text: Column): Column =
    graft.Stable.r4((length(text) - length(translate(text,
      "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~", ""))).cast("double") /
      greatest(length(text), lit(1)))

  /** English stopword ratio over whitespace tokens (small fixed list —
    * the quality-score feature the reference-style pipelines threshold). */
  val EnStopwords: Seq[String] =
    Seq("a", "an", "the", "of", "in", "on", "and", "or", "to", "is", "are", "was", "it")

  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(text), " ")
    graft.Stable.r4(size(filter(toks, t => t.isInCollection(EnStopwords))).cast("double") /
      greatest(size(toks), lit(1)))
  }

  def avgWordLen(text: Column): Column = {
    val toks = split(text, " ")
    graft.Stable.r4(aggregate(transform(toks, w => length(w).cast("long")), lit(0L), (a, x) => a + x)
      .cast("double") / greatest(size(toks), lit(1)))
  }

  /** Composite quality score ∈ [0,1]: long-enough, low punctuation, some
    * but not all stopwords — the standard pretraining-corpus heuristic
    * shape (C4/Gopher-style rules), deterministic and SQL-expressible. */
  def qualityScore(text: Column): Column =
    graft.Stable.r4(when(length(text) < 20, 0.0).otherwise(
        (lit(1.0) - punctRatio(text)) * 0.4 +
          when(stopwordRatio(text).between(0.05, 0.6), 0.4).otherwise(0.0) +
          when(tokenCount(text) >= 10, 0.2).otherwise(0.0)))

  /** Character-trigram language-ID heuristic: score each candidate
    * language by NON-overlapping hits of its signature trigrams/words
    * (replace-count semantics, so the score is SQL-expressible), argmax
    * with greatest-language tie-break. Deterministic; oracle-checked
    * (q37 builds the equivalent DuckDB SQL from this same table). */
  val LangSignatures: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " is ", "ing "),
    "de" -> Seq(" der ", " und ", " die ", " ist ", "sch"),
    "es" -> Seq(" el ", " la ", " de ", " que ", "ción"),
    "fr" -> Seq(" le ", " la ", " et ", " est ", "eux "),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def languageIdKernel(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val padded = " " + text.toLowerCase + " "
    val scores = LangSignatures.map { case (lang, sigs) =>
      lang -> sigs.map { s =>
        // non-overlapping count (advance past the match) — identical to
        // (len(t) - len(replace(t, s, ''))) / len(s) in SQL
        var c = 0; var i = padded.indexOf(s)
        while (i >= 0) { c += 1; i = padded.indexOf(s, i + s.length) }
        c
      }.sum
    }
    val best = scores.maxBy { case (lang, sc) => (sc, lang) }
    if (best._2 == 0) "und" else best._1
  }

  val languageIdUdf = udf((s: String) => languageIdKernel(s))

  /** Karp-Rabin rolling-hash document fingerprint: polynomial hash of the
    * token stream mod 2^61-1; equal fingerprints ⇒ near-certain equal
    * token streams (content-defined identity for dedup across formats).
    */
  def fingerprintKernel(tokens: Seq[String]): Long = {
    val M = (1L << 61) - 1
    val B = 1000003L
    var h = 0L
    tokens.foreach { t =>
      var th = 0L
      var i = 0
      // th can reach M-1 ~ 2^61, so th*131 overflows a Long — the inner
      // product needs the same overflow-safe mulMod as the outer one
      while (i < t.length) { th = (mulMod(th, 131, M) + t.charAt(i)) % M; i += 1 }
      h = (mulMod(h, B, M) + th + 1) % M
    }
    h
  }

  private def mulMod(a: Long, b: Long, m: Long): Long =
    (BigInt(a) * b % m).toLong

  val fingerprintUdf = udf((toks: Seq[String]) => fingerprintKernel(toks))

  /** PII/link scrubbing for pretraining corpora: mask emails, URLs, and
    * long digit runs (the standard cleaning battery) — pure regexp
    * projections, trivially distributed. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "https?://[^\\s]+", "<URL>"),
      "\\d{6,}", "<NUM>")

  /** Repetition ratio (Gopher-style quality rule): 1 − distinct/total
    * n-gram windows; high values flag boilerplate/repeated content.
    * Total windows = tokens − n + 1; distinct from [[Dedup.shingles]]. */
  def repetitionRatio(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    val total = size(toks) - (n - 1)
    // NULL text first: under ANSI mode size(NULL) is NULL, so the
    // total<=0 guard alone would NULL-propagate instead of scoring 0
    when(text.isNull || total <= 0, 0.0).otherwise(
      graft.Stable.r4(lit(1.0) -
        size(graft.ops.Dedup.shingles(text, n)).cast("double") / total))
  }

  /** Corpus-level per-language stats (the declared B24 query body). */
  def langStats(docs: DataFrame): DataFrame =
    docs.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        graft.Stable.r4(sum(tokenCount(col("text")).cast("long")).cast("double") / count(lit(1)))
          .as("avg_tokens"),
        countDistinct(col("source")).as("n_sources"))

  /** Top-k terms per language by frequency (explode → two-level agg →
    * ranked window; the explode fan-out is the only row-multiplying step
    * and aggregates immediately — the scalable shape). */
  def topTermsPerLang(docs: DataFrame, k: Int): DataFrame = {
    val counts = docs.select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .groupBy("lang", "term").agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy("lang").orderBy(col("freq").desc, col("term"))
    counts.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }
}
