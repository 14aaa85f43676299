package graft.rel

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Hand-computable cases for the round-8 pipeline wave (the DuckDB hash
  * gate checks the full-table results; these pin the kernels' edge
  * semantics on inputs small enough to verify by hand). */
class PipelineQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- q122 dupSpans ---------------------------------------------------------

  private def spans(rows: Seq[(Long, String)], l: Int): Map[Long, (Long, Long, Long)] =
    PipelineQueries.dupSpans(rows.toDF("doc_id", "text"), l)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("dupSpans: identical docs are fully covered; a unique doc is untouched") {
    val out = spans(Seq(
      1L -> "a b c d e f",
      2L -> "a b c d e f",
      3L -> "q r s t u v"), l = 4)
    // docs 1/2: windows at k=0,1,2 all shared → union covers all 6 tokens
    assert(out(1L) == ((6L, 3L, 6L)) && out(2L) == ((6L, 3L, 6L)))
    assert(out(3L) == ((6L, 0L, 0L)))
  }

  test("dupSpans: overlapping windows merge into one interval (no double count)") {
    // doc 1 has 'a b c d e' twice with a gap; doc 2 shares that span once.
    // doc 1: dup windows at k=0 (a b c d) and k=1 (b c d e) overlap →
    // covered = min(4, 1-0) + 4 = 5 for the first occurrence; second
    // occurrence at k=7,8 likewise → 10 of 12 tokens.
    val out = spans(Seq(
      1L -> "a b c d e x y a b c d e",
      2L -> "z a b c d e z2 q w r t y"), l = 4)
    assert(out(1L) == ((12L, 4L, 10L)))
    // doc 2: windows k=1 (a b c d), k=2 (b c d e) → covered 5
    assert(out(2L) == ((12L, 2L, 5L)))
  }

  test("dupSpans: within-doc repetition alone counts as duplication") {
    val out = spans(Seq(1L -> "a b c a b c a b c"), l = 3)
    // windows: k=0..6; contents 'a b c','b c a','c a b' each ×3,
    // 'a b c' ×3 — every window duplicated → full coverage
    assert(out(1L) == ((9L, 7L, 9L)))
  }

  test("dupSpans: docs shorter than L report zeros, not missing rows") {
    val out = spans(Seq(1L -> "a b", 2L -> "a b"), l = 4)
    assert(out(1L) == ((2L, 0L, 0L)) && out(2L) == ((2L, 0L, 0L)))
  }
}
