package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}
import graft.rel.{Tables, TrainPrepQueries, WebCurationQueries}

/** End-to-end composition: every stage of a real curation pipeline run
  * back-to-back through the library's DataFrame-level APIs — crawl
  * ingest (canonical-URL dedup → HTML main-content extraction) → exact
  * dedup → near-dup cluster rewrite → quality gate → fuzzy
  * decontamination → per-cell quota → fixed-length sequence packing.
  * The per-operator oracles prove each stage alone; THIS suite proves
  * they compose (schemas line up, survivors flow, the whole chain is
  * deterministic end-to-end), which is what "a user could switch their
  * pipeline to this library" actually requires. */
class CurationPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def pipeline(): DataFrame = {
    val raw = Tables.load(spark, dir, "documents")

    // 0. crawl ingest: keep one fetch per canonical URL (q151's keeper
    //    election — the pre-content dedup), then replace each kept raw
    //    page with its extracted main content (q153's chain); source and
    //    lang ride along for the quota stage downstream
    val pages = raw
      .withColumn("url", expr(WebCurationQueries.rawUrlExpr))
      .withColumn("html", expr(WebCurationQueries.htmlExpr))
    val keepers = WebCurationQueries
      .canonicalUrlDedup(pages.select(col("doc_id"), col("url")))
      .select(col("keeper_doc").as("doc_id"))
    val docs = pages.join(keepers, "doc_id")
      .select(col("doc_id"), col("source"), col("lang"),
        WebCurationQueries.extractedText(col("html")).as("text"))

    // 1. exact dedup: one representative per normalized-text hash
    val exact = Dedup.exactKeepFirst(
        docs.withColumn("_k", md5(lower(col("text")))),
        Seq("_k"), Seq(col("doc_id")))
      .drop("_k")

    // 2. near-dup rewrite: Jaccard pairs → connected components → keep
    //    the min-id representative per cluster (q95's mechanics)
    val pairs = Dedup.jaccardPairs(exact, "doc_id", "text", n = 3, tau = 0.8)
    val cc = Dedup.connectedComponents(pairs, "d1", "d2")
      .withColumnRenamed("id", "doc_id")
    val wKeep = Window.partitionBy("cluster").orderBy("doc_id")
    val neardup = exact.join(cc, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .withColumn("_rk", row_number().over(wKeep))
      .where(col("_rk") === 1).drop("_rk", "cluster")

    // 3. quality gate: C4/Gopher-style composite score
    val gated = neardup.where(TextAnalysis.qualityScore(col("text")) >= 0.5)

    // 4. fuzzy decontamination: drop anything near-duplicating the held
    //    -out eval slice (q139's split + leakage machinery)
    val leaks = TrainPrepQueries.splitLeakage(gated, n = 3, tau = 0.5)
      .select(col("d_train").as("doc_id")).distinct()
    val evalSplit = pmod(col("doc_id") * lit(69621L), lit(65536L)) < 6554L
    val train = gated.where(!evalSplit)
      .join(leaks, Seq("doc_id"), "left_anti")

    // 5. per-cell quota (absolute caps per source x lang)
    val quota = TrainPrepQueries.quotaSample(train, cap = 3)
      .select("doc_id")
      .join(train, Seq("doc_id"))

    // 6. fixed-length sequence packing with boundary metadata
    TrainPrepQueries.sequencePack(quota, L = 64L)
  }

  test("stages compose: survivors flow, schema holds, packing covers every survivor") {
    val docs = Tables.load(spark, dir, "documents")
    val n0 = docs.count()
    val packed = pipeline().collect()
    assert(packed.nonEmpty && packed.length <= n0)
    // the ingest front is real: canonical-URL dedup caps survivors at the
    // canonical-group count (doc_id % 60 determines the canonical identity)
    assert(packed.length <= 60, s"URL dedup did not gate the chain: ${packed.length}")
    // every packed row carries the full boundary metadata contract
    val L = 64L
    packed.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) < L) // first_off
      assert(r.getLong(5) >= 1)                     // n_seqs
    }
    // the filters are real at this SF: something was dropped along the way
    assert(packed.length < n0,
      s"pipeline dropped nothing (${packed.length} of $n0) — stages not exercised")
  }

  test("the whole chain is deterministic: two independent runs are identical") {
    val a = pipeline().collect().map(_.toSeq).toSeq
    val b = pipeline().collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
