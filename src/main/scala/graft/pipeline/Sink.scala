package graft.pipeline

import org.apache.spark.sql.DataFrame

/** A2 `save_result` (`utils.py:361-365`): append-only JSONL sink.
  *
  * The reference appends one JSON line per record (`mode 'a+'`), which
  * doubles as record-granularity crash resumability. The Spark analog is
  * an append-mode JSON directory write: each run adds part files,
  * re-reads see the union — with resume-by-id-range
  * ([[Inference.sliceRange]]) replacing per-record offsets, which is the
  * idempotent restart shape that survives distributed execution. */
object Sink {

  def appendJsonl(df: DataFrame, dir: String): Unit =
    df.write.mode("append").json(dir)

  /** The eval record write (`run_llm_ours.py:308`): one summary row.
    * SINGLE-ROW ONLY — the coalesce(1) exists so the one metrics record
    * lands in one file; it serializes the write through a single task, so
    * never reuse this for data-sized outputs (use [[appendJsonl]]). */
  def writeEval(df: DataFrame, dir: String): Unit =
    df.coalesce(1).write.mode("overwrite").json(dir)
}
