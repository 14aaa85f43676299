package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** q178 BM25 served off persisted postings: bit-for-bit parity with the
  * inline q104 scorer, the PartitionFilters term-bucket prune, and a
  * serve plan free of tokenize stages (the build/serve contract). */
class Bm25ServedSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  // Parity caveat: both paths sum <= 3 per-term doubles per doc, and
  // addition order is plan-dependent, so a sum landing within 1 ulp of
  // an x.xxxx5 boundary could flip under Stable.r4 — the SAME hazard
  // class q104's own DuckDB oracle and its 3-vs-32-partition invariance
  // pin carry, accepted there and re-checked every run; the shared
  // Lexical.bm25Term single-sources the expression so the two paths
  // cannot drift algebraically.
  test("served scores equal the inline q104 scorer bit-for-bit") {
    val served = graft.SparkEntry.queries("q178_bm25_served")(spark, dir)
    val inline = graft.SparkEntry.queries("q104_bm25")(spark, dir)
    assert(rows(served) == rows(inline))
  }

  test("serve plan prunes postings to the query terms' buckets at the " +
    "listing level and contains no tokenize stages") {
    val served = graft.SparkEntry.queries("q178_bm25_served")(spark, dir)
    val phys = served.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = phys.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n")
    assert(pf.contains("tb"),
      s"term-bucket partition filter must reach the postings scan:\n$pf")
    // the serve plan reads the artifact; the corpus pass (split/explode
    // of documents.text) must not appear
    assert(!phys.contains("explode"), "serve plan re-tokenizes the corpus")
    assert(!phys.contains("documents.parquet"),
      "serve plan must scan the postings artifact, not the corpus")
  }

  test("pruned-slice df is the exact corpus marginal (a term's postings " +
    "all live in its bucket)") {
    import org.apache.spark.sql.functions._
    val docs = graft.rel.Tables.load(spark, dir, "documents")
    val (postings, _) = Lexical.servedPostingsFor(
      spark, dir, docs, "doc_id", "text")
    val terms = Seq("spark", "join", "merge")
    val buckets = {
      import spark.implicits._
      terms.toDF("term").select(Lexical.termBucket(col("term")))
        .collect().map(_.getLong(0)).distinct.toSeq
    }
    val prunedDf = postings
      .where(col("tb").isin(buckets: _*) && col("term").isin(terms: _*))
      .groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fullDf = docs
      .select(explode(split(col("text"), " ")).as("tk"), col("doc_id"))
      .where(col("tk").isin(terms: _*))
      .groupBy("tk").agg(countDistinct(col("doc_id")).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prunedDf == fullDf)
  }
}
