package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexical (BM25) retrieval with a BUILD/SERVE split — the text-side
  * twin of the graph-ANN split (q171/q172): the corpus is tokenized
  * ONCE into a posting table published through [[ModelStore]], and a
  * query then touches only its own terms' partitions.
  *
  * Artifact layout (one ModelStore dir, atomic-rename published):
  *   postings/  (tb, term, doc_id, tf, dl) parquet PARTITIONED BY tb —
  *              tb = xxhash64(term) mod [[TermBuckets]], so a query's
  *              scan prunes to ≤ |terms| of [[TermBuckets]] directories
  *              at the LISTING level (PartitionFilters, the q88
  *              pattern) before any row is read. dl is denormalized
  *              into the posting row: serving never joins a
  *              corpus-sized side table.
  *   stats/     1 row (n_docs, avgdl) — broadcast at serve time.
  *
  * Serving recomputes df (document frequency) from the PRUNED postings
  * — the same marginal q104 derives inline — so served scores are the
  * identical IEEE expression and the declared served query (q178)
  * carries q104's full DuckDB hash oracle verbatim.
  *
  * Scale: the build is one term-keyed shuffle of the token stream (the
  * exchange every inverted-index builder pays); the artifact is
  * O(total tokens) rows of 5 narrow columns; serving work is
  * proportional to the query terms' posting lists, never the corpus.
  * At 100 TB the bucket count rises with the vocabulary so each
  * directory stays splittable-file-sized. */
object Lexical {

  val TermBuckets = 64

  def termBucket(c: Column): Column =
    pmod(xxhash64(c), lit(TermBuckets.toLong))

  /** THE BM25 per-term expression — single-sourced because three
    * consumers (inline q104, the served q178 scorer, the q179
    * evaluation run) and two committed oracles pin it byte-identical:
    * an edit that reached one copy and not the others would fail the
    * parity/oracle gates in a non-obvious way. */
  def bm25Term(tf: Column, df: Column, dl: Column,
               nDocs: Column, avgdl: Column): Column =
    log((nDocs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 /
      (tf + lit(1.2) * (lit(0.25) + lit(0.75) * dl / avgdl))

  /** One-pass postings build from a (docId, text) frame: tokenize,
    * per-(term, doc) counts, document length denormalized in. */
  def buildPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("t"))
    val dl = toks.select(col("doc_id"), size(col("t")).cast("double").as("dl"))
    toks.select(col("doc_id"), explode(col("t")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).cast("double").as("tf"))
      .join(dl, "doc_id")
      .select(termBucket(col("term")).as("tb"), col("term"),
        col("doc_id"), col("tf"), col("dl"))
  }

  /** Corpus-level BM25 stats (the 1-row broadcast side). */
  def buildStats(docs: DataFrame, textCol: String): DataFrame =
    docs.select(size(split(col(textCol), " ")).cast("double").as("dl"))
      .agg(count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl"))

  /** BM25 top-k over a postings/stats pair (however obtained): filter
    * the query terms (partition-pruned when postings came from the
    * published artifact), derive df on the pruned slice, score with
    * q104's exact expression, TakeOrdered the top k. */
  def bm25TopK(postings: DataFrame, stats: DataFrame,
               terms: Seq[String], k: Int): DataFrame = {
    val s = postings.sparkSession
    import s.implicits._
    // bucket ids for the query terms, computed by the SAME expression
    // that wrote the partition column (one |terms|-row local job)
    val buckets = terms.toDF("term").select(termBucket(col("term")))
      .collect().map(_.getLong(0)).distinct.toSeq
    val hit = postings
      .where(col("tb").isin(buckets: _*) && col("term").isin(terms: _*))
    val df = hit.groupBy("term")
      .agg(countDistinct(col("doc_id")).cast("double").as("df"))
    hit.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(sum(bm25Term(col("tf"), col("df"), col("dl"),
        col("n_docs"), col("avgdl"))).as("score"))
      .select(col("doc_id"), graft.Stable.r4(col("score")).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(k)
  }

  /** Resolve the published postings artifact for a corpus, building and
    * publishing it on first use (the q172 `servedGraphFor` protocol:
    * fingerprint key, staged atomic rename, store failure degrades to
    * the inline build, a corrupt dir is dropped and rebuilt). Returns
    * (postings, stats). */
  def servedPostingsFor(s: SparkSession, corpusKey: String,
                        docs: => DataFrame, idCol: String, textCol: String
                       ): (DataFrame, DataFrame) = {
    def inline(): (DataFrame, DataFrame) =
      (buildPostings(docs, idCol, textCol), buildStats(docs, textCol))
    def readBack(dest: ModelStore.Loc): (DataFrame, DataFrame) =
      (s.read.parquet(dest.child("postings")),
        s.read.parquet(dest.child("stats")))
    def publishAndRead(dest: ModelStore.Loc): (DataFrame, DataFrame) = {
      val tmp = ModelStore.staging(dest)
      buildPostings(docs, idCol, textCol).write.mode("overwrite")
        .partitionBy("tb")
        .parquet(tmp.child("postings"))
      buildStats(docs, textCol).write.mode("overwrite")
        .parquet(tmp.child("stats"))
      ModelStore.publish(tmp, dest)
      readBack(dest)
    }
    // store disabled -> inline, WITHOUT forcing the fingerprint job
    // (the aggregate is the price of the staleness discipline, not of
    // serving — a disabled store shouldn't pay it)
    if (!ModelStore.enabled) return inline()
    // the key carries every knob that shaped the artifact: (n, h) the
    // CONTENT fingerprint (count + xxhash64 digest of the (id, text)
    // rows, so an in-place same-count rewrite re-keys instead of
    // serving stale postings cross-process forever), b the partition
    // modulus — serving computes query buckets with the CURRENT
    // TermBuckets, so reading an artifact written under a different
    // modulus would silently drop postings (the q172 k=$k discipline)
    val (n, h) = ModelStore.fingerprint(
      docs.select(col(idCol), col(textCol)), col(idCol), col(textCol))
    val key = s"$corpusKey|postings|v1|b=$TermBuckets|n=$n|h=$h"
    ModelStore.dirLoc("lexical", key) match {
      case Some(dest) if dest.exists =>
        try readBack(dest)
        catch { case scala.util.control.NonFatal(_) =>
          ModelStore.drop(dest)
          try publishAndRead(dest)
          catch { case scala.util.control.NonFatal(_) => inline() }
        }
      case Some(dest) =>
        try publishAndRead(dest)
        catch { case scala.util.control.NonFatal(_) => inline() }
      case None => inline()
    }
  }
}
