package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.rel.Tables

/** B29: metric-threshold + determinism tests (no SQL oracle exists for
  * model internals — SURVEY §2 Part B). */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("logistic model fits the embeddings table far above chance") {
    val embs = Tables.load(spark, SparkTestBase.Sf0001, "embeddings")
    val pred = Retrieval.fitPredictEmbeddings(embs).cache()
    val n = pred.count().toDouble
    val correct = pred.where(col("label") === col("prediction")).count().toDouble
    // 10 classes -> chance is 0.1; the synthetic embeddings are only
    // weakly linearly separable (observed ~0.41 train accuracy)
    assert(correct / n > 0.3, s"train accuracy ${correct / n}")
  }

  test("predictions are deterministic across refits") {
    val embs = Tables.load(spark, SparkTestBase.Sf0001, "embeddings")
    val a = Retrieval.fitPredictEmbeddings(embs).orderBy("vec_id")
      .collect().map(_.toSeq).toSeq
    val b = Retrieval.fitPredictEmbeddings(embs).orderBy("vec_id")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("tfIdfFor cache: hit on identical corpus, refit when the corpus changes under a reused key") {
    import spark.implicits._
    val corpusA = Seq((1L, "apple banana"), (2L, "banana cherry")).toDF("doc_id", "text")
    val corpusB = Seq((1L, "apple banana"), (2L, "banana cherry"),
      (3L, "cherry date"), (4L, "date egg")).toDF("doc_id", "text")
    val key = "staleness-spec-" + System.nanoTime() // fresh key per run
    val (mA1, _) = Retrieval.tfIdfFor(corpusA, key)
    val (mA2, _) = Retrieval.tfIdfFor(corpusA, key)
    assert(mA1 eq mA2, "identical corpus under one key must hit the cache")
    // regenerated corpus under the SAME caller key: the row-count
    // fingerprint must force a refit — document frequencies now reflect
    // corpusB, not stale corpusA
    val (mB, _) = Retrieval.tfIdfFor(corpusB, key)
    assert(!(mB eq mA1), "changed corpus under a reused key must refit")
    assert(mB.idf.idf != mA1.idf.idf, "refit model must carry corpusB document frequencies")
    // explicit hook for the same-count rewrite case
    Retrieval.clearCache()
    val (mA3, _) = Retrieval.tfIdfFor(corpusA, key)
    assert(!(mA3 eq mA1), "clearCache must drop cached models")
  }

  test("tf-idf retrieval returns ranked overlapping docs") {
    val docs = Tables.load(spark, SparkTestBase.Sf0001, "documents")
    val (model, docsTfIdf) = Retrieval.fitTfIdf(docs)
    val hits = Retrieval.scoreQuery(spark, model, docsTfIdf,
      Seq("spark", "query", "window"), k = 10).collect()
    assert(hits.length == 10)
    val scores = hits.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted.reverse)) // ranked desc
    assert(scores.forall(_ > 0))
    // every hit actually contains a query term
    val ids = hits.map(_.getAs[Long]("doc_id")).toSet
    val withTerm = docs.where(col("text").rlike("spark|query|window"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(withTerm))
  }
}
