package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.rel.Tables

/** Disk persistence for the cached-fit model family: bit-exact
  * round-trips, and warm-from-disk serving that matches the in-memory
  * fit without rerunning it (the cross-JVM amortization mechanism). */
class ModelStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def uniq(prefix: String) = s"$prefix-${System.nanoTime()}"

  test("centers round-trip raw IEEE-754 bits exactly") {
    val key = uniq("centers")
    val centers = Array(
      Array(1.0, -0.0, math.Pi, 1e-308, Double.MinPositiveValue),
      Array(0.1 + 0.2, -1e300, 4.9e-324, 123456.789, 2.0 / 3.0))
    ModelStore.saveCenters(key, centers)
    val back = ModelStore.loadCenters(key).get
    assert(back.length == centers.length)
    for (i <- centers.indices)
      assert(back(i).map(java.lang.Double.doubleToRawLongBits).toSeq ==
        centers(i).map(java.lang.Double.doubleToRawLongBits).toSeq,
        s"row $i drifted")
    assert(ModelStore.loadCenters(uniq("missing")).isEmpty)
  }

  test("PQ codebooks and BPE merge tables round-trip exactly") {
    val pqKey = uniq("pq")
    val pq = Similarity.PqModel(2, 3, 2, Array(
      Array(Array(1.5, -2.5), Array(0.0, 1e-9), Array(3.25, 4.75)),
      Array(Array(-1.0, -2.0), Array(5.5, 6.5), Array(7.0, 0.125))))
    ModelStore.savePq(pqKey, pq)
    val pqBack = ModelStore.loadPq(pqKey).get
    assert(pqBack.m == pq.m && pqBack.ks == pq.ks && pqBack.dsub == pq.dsub)
    assert(pqBack.codebooks.flatten.flatten.toSeq == pq.codebooks.flatten.flatten.toSeq)

    val bpeKey = uniq("bpe")
    val merges = Seq(Bpe.Merge(1, "t", "h", 42L), Bpe.Merge(2, "th", "e", 17L),
      Bpe.Merge(3, "é", "☃", 1L))
    ModelStore.saveMerges(bpeKey, merges)
    assert(ModelStore.loadMerges(bpeKey).get == merges)
  }

  test("IVF warm-from-disk: after the in-memory cache is cleared, serving " +
    "loads the published centers instead of refitting (no KMeans jobs) and " +
    "reproduces the fit-path output bit for bit") {
    val key = uniq("ivf-disk")
    val emb = Tables.load(spark, dir, "embeddings").localCheckpoint()
    val qids = Seq(0L, 1L, 2L)
    val cold = Similarity.ivfTopK(emb, "vec_id", "embedding", qids, 3,
      corpusKey = Some(key)).orderBy("qid", "rn").collect().map(_.toSeq).toSeq
    // a fresh JVM is simulated by dropping the L1: the only remaining
    // source of the fitted centers is the ModelStore file
    Similarity.clearCaches()
    val group = uniq("warm-disk")
    spark.sparkContext.setJobGroup(group, "ivf warm from disk", false)
    val warmDf =
      try Similarity.ivfTopK(emb, "vec_id", "embedding", qids, 3,
        corpusKey = Some(key))
      finally spark.sparkContext.clearJobGroup()
    def groupJobs() = spark.sparkContext.statusTracker.getJobIdsForGroup(group)
    val (_, settled) = graft.BenchUtil.pollQuiescent(
      () => groupJobs().length, minValue = 1)
    assert(settled, "status tracker never went quiescent")
    val stages = groupJobs().flatMap(j =>
      spark.sparkContext.statusTracker.getJobInfo(j).toSeq.flatMap(_.stageIds()))
      .flatMap(sid => spark.sparkContext.statusTracker.getStageInfo(sid).toSeq)
      .map(_.name()).toSeq
    assert(stages.forall(!_.contains("KMeans")),
      s"disk-warm resolution must not refit (stages: ${stages.mkString("; ")})")
    val warm = warmDf.orderBy("qid", "rn").collect().map(_.toSeq).toSeq
    assert(warm == cold, "disk-served centers must reproduce the fit output")
    Similarity.clearCaches()
  }

  test("BPE warm-from-disk: a cleared-JVM relearn becomes one fingerprint " +
    "count plus a file read, with the identical merge table") {
    val key = uniq("bpe-disk")
    val docs = Tables.load(spark, dir, "documents").localCheckpoint()
    val learned = Bpe.learnMergesCached(docs, "text", nMerges = 12, corpusKey = key)
    val group = uniq("bpe-warm")
    spark.sparkContext.setJobGroup(group, "bpe warm from disk", false)
    val again =
      try Bpe.learnMergesCached(docs, "text", nMerges = 12, corpusKey = key)
      finally spark.sparkContext.clearJobGroup()
    assert(again == learned, "disk-served merges must match the fit")
    def groupJobs() = spark.sparkContext.statusTracker.getJobIdsForGroup(group)
    val (jobs, settled) = graft.BenchUtil.pollQuiescent(
      () => groupJobs().length, minValue = 1)
    assert(settled, "status tracker never went quiescent")
    // the cached path pays the raw count(1) fingerprint (AQE may wrap it
    // in one extra result job) — never the vocabulary induction loop
    assert(jobs <= 2, s"warm BPE resolution ran $jobs jobs (want <=2)")
  }

  test("TF-IDF warm-from-disk: after clearCache the model loads from the " +
    "published MLlib dir and scores identically") {
    val key = uniq("tfidf-disk")
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").localCheckpoint()
    val (m1, scored1) = graft.ml.Retrieval.tfIdfFor(docs, key)
    val s1 = scored1.select(col("doc_id"), col("tfidf").cast("string"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    graft.ml.Retrieval.clearCache()
    val (m2, scored2) = graft.ml.Retrieval.tfIdfFor(docs, key)
    val s2 = scored2.select(col("doc_id"), col("tfidf").cast("string"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(s1 == s2, "disk-loaded IDF model must score bit-identically")
    assert(java.util.Arrays.equals(
      m1.idf.idf.toArray.map(java.lang.Double.doubleToRawLongBits),
      m2.idf.idf.toArray.map(java.lang.Double.doubleToRawLongBits)),
      "idf vector must round-trip through MLlib persistence exactly")
    graft.ml.Retrieval.clearCache()
  }
}
