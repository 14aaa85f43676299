package graft.rel

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** q176 retrieval evaluation metrics: hand-computed example, plan pins,
  * and the metric-range invariants on the declared corpus run.
  *
  * The DuckDB oracle already gates the full sf0.01 values; what it
  * cannot show is WHY the numbers are right — the hand case here walks
  * one query through run construction, graded qrels, the integer
  * DCG/IDCG dot products and every terminal division, so an arithmetic
  * regression fails with a readable expected value instead of a corpus
  * hash mismatch. */
class RetrievalMetricsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  test("hand case: run order, graded rels and the exact DCG/IDCG integers") {
    import spark.implicits._
    // One query {alpha, beta}. tfsum ties (d1=d2=6) break by doc_id, so the
    // rel-1 doc OUTRANKS the rel-2 doc and nDCG lands strictly inside (0,1).
    val docs = Seq(
      (1L, "alpha alpha beta beta beta beta"),   // mintf 2 -> rel 1, tfsum 6
      (2L, "alpha alpha alpha beta beta beta"),  // mintf 3 -> rel 2, tfsum 6
      (3L, "alpha beta"),                        // mintf 1 -> rel 0, tfsum 2
      (4L, "alpha alpha alpha alpha"),           // one term -> rel 0, tfsum 4
      (5L, "gamma gamma")                        // no query term: not in the run
    ).toDF("doc_id", "text")
    val out = CurationQueries
      .retrievalMetricsAt10(docs, Seq((1L, "alpha"), (1L, "beta")))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_rel") == 2L)
    assert(r.getAs[Long]("hits_at_10") == 2L)
    assert(r.getAs[Double]("precision_at_10") == 0.2)
    assert(r.getAs[Double]("recall_at_10") == 1.0)
    // rank 1 (d1) is rel-1, so MRR = 1/1 even though the BEST doc is rank 2
    assert(r.getAs[Double]("mrr") == 1.0)
    // DCG  = gain(rel1)*disc1 + gain(rel2)*disc2 = 1*1e9 + 3*630929754
    // IDCG = ideal order swaps them             = 3*1e9 + 1*630929754
    val dcg = 1L * 1000000000L + 3L * 630929754L
    val idcg = 3L * 1000000000L + 1L * 630929754L
    assert(r.getAs[Long]("dcg_n9") == dcg)
    val expNdcg = math.floor(dcg.toDouble / idcg.toDouble * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("ndcg_at_10") == expNdcg)
    assert(expNdcg > 0.79 && expNdcg < 0.80) // strictly inside (0,1)
  }

  test("3-term query grades against its own term count, not a hardcoded 2") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b b b c c c"), // all three >=3 -> rel 2
      (2L, "a a b b c c"),       // all three =2  -> rel 1
      (3L, "a a a b b b")        // missing c     -> rel 0
    ).toDF("doc_id", "text")
    val r = CurationQueries
      .retrievalMetricsAt10(docs, Seq((1L, "a"), (1L, "b"), (1L, "c")))
      .collect().head
    assert(r.getAs[Long]("n_rel") == 2L, "both full-coverage docs must grade rel >= 1")
    assert(r.getAs[Long]("hits_at_10") == 2L)
    assert(r.getAs[Double]("recall_at_10") == 1.0)
  }

  test("empty-relevance query: zero metrics, no NaN/null leakage") {
    import spark.implicits._
    // beta never co-occurs >=2x with alpha: nrel = 0 for the query, so
    // recall divides 0/0 -- the guards must emit 0.0, not NaN.
    val docs = Seq((1L, "alpha alpha"), (2L, "alpha beta gamma")).toDF("doc_id", "text")
    val out = CurationQueries
      .retrievalMetricsAt10(docs, Seq((7L, "alpha"), (7L, "beta")))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_rel") == 0L)
    assert(r.getAs[Long]("hits_at_10") == 0L)
    assert(r.getAs[Double]("mrr") == 0.0)
    assert(r.getAs[Long]("dcg_n9") == 0L)
    assert(r.getAs[Double]("ndcg_at_10") == 0.0) // idcg = 0 guard
    // recall 0/0: the run exists but no doc is relevant
    val rec = r.getAs[Double]("recall_at_10")
    assert(!rec.isNaN && rec == 0.0,
      s"recall must be the guarded 0.0, got $rec")
  }

  test("plan: run cut is the TopKPerKey operator; dimension tables broadcast") {
    val qe = graft.SparkEntry.queries("q176_retrieval_metrics")(spark, dir)
      .queryExecution
    val opt = qe.optimizedPlan.toString
    assert(opt.contains("TopKPerKey"),
      "per-qid run cut must plan on the custom bounded-heap operator")
    val phys = qe.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(phys.contains("BroadcastHashJoin"),
      "query-term and discount joins must broadcast")
    // the only nested-loop is the |Q|-row relcnt x 10-row discount cross,
    // and it must be against a broadcast, never a shuffled cartesian
    assert(!phys.contains("CartesianProduct"), phys.linesIterator
      .filter(_.contains("Cartesian")).mkString("\n"))
  }

  test("declared corpus run: metric ranges and internal consistency") {
    val rows = graft.SparkEntry.queries("q176_retrieval_metrics")(spark, dir)
      .collect()
    assert(rows.length == 6, "one row per declared query")
    rows.foreach { r =>
      val hits = r.getAs[Long]("hits_at_10")
      assert(hits >= 0L && hits <= 10L)
      val p = r.getAs[Double]("precision_at_10")
      assert(p == math.floor(hits.toDouble / 10.0 * 1e6 + 0.5) / 1e6)
      val rec = r.getAs[Double]("recall_at_10")
      assert(rec >= 0.0 && rec <= 1.0)
      val ndcg = r.getAs[Double]("ndcg_at_10")
      assert(ndcg >= 0.0 && ndcg <= 1.0, s"ndcg out of range: $ndcg")
      val mrr = r.getAs[Double]("mrr")
      assert(mrr >= 0.0 && mrr <= 1.0)
      // a hit in the run implies a reciprocal rank and a positive dcg
      if (hits > 0)
        assert(mrr > 0.0 && r.getAs[Long]("dcg_n9") > 0L)
    }
  }
}
