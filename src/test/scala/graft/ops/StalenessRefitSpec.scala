package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The same-count-rewrite hazard is CLOSED: every ModelStore key embeds
  * a content digest ([[ModelStore.fingerprint]]), so a corpus rewritten
  * in place at UNCHANGED cardinality re-keys its artifacts and the
  * store refits instead of serving the stale model — the one staleness
  * case the old row-count fingerprints could not see, and (per the r13
  * review) a cross-process wrong-answer path unbounded in time. Each
  * test serves corpus A, then re-serves the SAME key with a same-count
  * corpus B and asserts the answer is B's fresh fit, not A's. */
class StalenessRefitSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def uniq(prefix: String) = s"$prefix-${System.nanoTime()}"

  /** Two deterministic 24-row, 8-dim corpora with the same ids and the
    * same count but different vectors (B is A rotated + shifted). */
  private def vecCorpus(variant: Int): DataFrame = {
    import spark.implicits._
    (0 until 24).map { i =>
      (i.toLong, (0 until 8).map(j =>
        math.sin(i * 7 + j * 3 + variant * 101) + variant * 0.25).toArray)
    }.toDF("vec_id", "embedding")
  }

  test("servedGraphFor: a same-count corpus rewrite under the same key " +
    "re-keys and refits — the served graph is B's, never stale A's") {
    val key = uniq("rewrite-graph")
    val a = vecCorpus(1); val b = vecCorpus(2)
    val servedA = graft.rel.PipelineQueries.servedGraphFor(spark, key, a, k = 3)
      .orderBy("vid", "rk").collect().map(_.toSeq).toSeq
    val servedB = graft.rel.PipelineQueries.servedGraphFor(spark, key, b, k = 3)
      .orderBy("vid", "rk").collect().map(_.toSeq).toSeq
    val freshB = Similarity.knnGraph(b, "vec_id", "embedding", k = 3)
      .orderBy("vid", "rk").collect().map(_.toSeq).toSeq
    assert(servedB == freshB, "rewritten corpus must serve its own graph")
    assert(servedA != servedB, "A and B must genuinely differ for this test")
  }

  test("servedPostingsFor: BM25 over a same-count rewritten corpus is " +
    "scored off fresh postings, not the stale artifact") {
    import spark.implicits._
    val key = uniq("rewrite-postings")
    def docs(variant: Int): DataFrame =
      (0 until 12).map { i =>
        // variant 1 puts "alpha" in docs 0-5; variant 2 puts "gamma" in
        // docs 3-8 — same row count, genuinely different ranking
        val extra =
          if (variant == 1 && i < 6) "alpha beta"
          else if (variant == 2 && i >= 3 && i < 9) "gamma delta"
          else "filler words"
        (i.toLong, s"common token$i $extra")
      }.toDF("doc_id", "text")
    def top(d: DataFrame): Seq[Seq[Any]] = {
      val (p, st) = Lexical.servedPostingsFor(spark, key, d, "doc_id", "text")
      Lexical.bm25TopK(p, st, Seq("alpha", "gamma"), 5)
        .collect().map(_.toSeq).toSeq
    }
    val a = top(docs(1))
    val b = top(docs(2))
    def inline(d: DataFrame) = Lexical.bm25TopK(
      Lexical.buildPostings(d, "doc_id", "text"),
      Lexical.buildStats(d, "text"), Seq("alpha", "gamma"), 5)
      .collect().map(_.toSeq).toSeq
    assert(b == inline(docs(2)), "rewritten corpus must serve fresh postings")
    assert(a != b, "A and B must genuinely differ for this test")
  }

  test("BPE merges: same count, different text, same key => relearned " +
    "table (and the driverVocabBound knob is part of the key)") {
    import spark.implicits._
    val key = uniq("rewrite-bpe")
    def docs(variant: Int): DataFrame =
      (0 until 10).map { i =>
        (i.toLong, if (variant == 1) "aaab aaab abab" else "zzzy zzzy zyzy")
      }.toDF("doc_id", "text")
    val a = Bpe.learnMergesCached(docs(1), "text", nMerges = 4, corpusKey = key)
    val b = Bpe.learnMergesCached(docs(2), "text", nMerges = 4, corpusKey = key)
    assert(b == Bpe.learnMerges(docs(2), "text", nMerges = 4),
      "rewritten corpus must relearn its merge table")
    assert(a != b)
    // distinct driver-vocab bounds must not share a cached fit: the
    // bound selects the driver-local vs distributed merge loop, and a
    // cross-served fit would mask any divergence between the two paths
    val tiny = Bpe.learnMergesCached(docs(2), "text", nMerges = 4,
      corpusKey = key, driverVocabBound = 0L)
    assert(tiny == b, "both loop arms must learn the identical table " +
      "(served from separate cache slots)")
  }

  test("TF-IDF: same count, different docs, same key => refit IDF") {
    import spark.implicits._
    val key = uniq("rewrite-tfidf")
    def docs(variant: Int): DataFrame =
      (0 until 8).map { i =>
        (i.toLong, if (variant == 1 && i < 4) "rare term here" else "common words only")
      }.toDF("doc_id", "text")
    val (m1, _) = graft.ml.Retrieval.tfIdfFor(docs(1), key)
    val (m2, _) = graft.ml.Retrieval.tfIdfFor(docs(2), key)
    assert(!java.util.Arrays.equals(m1.idf.idf.toArray, m2.idf.idf.toArray),
      "same-count rewrite must refit document frequencies")
  }

  test("IVF quantizer: a same-count rewrite refits the centers (served " +
    "top-k equals an uncached fresh fit on the new corpus)") {
    val key = uniq("rewrite-ivf")
    val a = vecCorpus(1); val b = vecCorpus(2)
    val qids = Seq(0L, 1L)
    Similarity.ivfTopK(a, "vec_id", "embedding", qids, 3,
      nCells = 4, corpusKey = Some(key)).collect()
    val servedB = Similarity.ivfTopK(b, "vec_id", "embedding", qids, 3,
      nCells = 4, corpusKey = Some(key))
      .orderBy("qid", "rn").collect().map(_.toSeq).toSeq
    val freshB = Similarity.ivfTopK(b, "vec_id", "embedding", qids, 3,
      nCells = 4, corpusKey = None)
      .orderBy("qid", "rn").collect().map(_.toSeq).toSeq
    assert(servedB == freshB,
      "rewritten corpus must be scored with freshly fit centers")
  }
}
