package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Single-pass pipeline health metrics via `Dataset.observe` — the
  * monitoring hook a 100-TB run needs: row counts, null/reject rates and
  * score sums are accumulated DURING the action that materializes the
  * result (observe compiles to an accumulator-backed aggregate inside the
  * same job), so quality telemetry costs zero extra scans. The reference
  * prints its eval record at the end of a single-threaded loop
  * (`run_llm_ours.py:295-306`); at scale the equivalent is exactly this —
  * metrics riding the job, not a second pass. */
object Monitor {

  private def qualityMetrics = Seq(
    count(lit(1)).as("n_rows"),
    sum(when(col("rag.answer").isNull || length(col("rag.answer")) === 0, 1L)
      .otherwise(0L)).as("n_empty_answers"),
    sum(when(col("rag.reject"), 1L).otherwise(0L)).as("n_rejects"),
    sum(when(col("label_decision") === "keep", 1L).otherwise(0L)).as("n_label_keep"),
    sum(coalesce(col("rag.EM").cast("long"), lit(0L))).as("sum_em"))

  /** Attach branch-quality metrics to a result-record frame (post-
    * annotation schema, SURVEY §1.1). Returns the instrumented frame and
    * the `Observation`; read `obs.get` AFTER an action has run. */
  def observeResults(df: DataFrame, name: String = "graft_quality"): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, qualityMetrics.head, qualityMetrics.tail: _*), obs)
  }

  /** Named-observation form for declared queries: metrics land in the
    * query's `QueryExecution.observedMetrics` (readable by any
    * `QueryExecutionListener`) with no per-call `Observation` listener to
    * manage — the right shape for a query invoked repeatedly by the
    * bench/verify harnesses. Plan- and result-transparent. */
  def instrument(df: DataFrame, name: String = "graft_quality"): DataFrame =
    df.observe(name, qualityMetrics.head, qualityMetrics.tail: _*)
}
