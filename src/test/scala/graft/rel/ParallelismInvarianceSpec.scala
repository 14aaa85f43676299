package graft.rel

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Declared results must be a pure function of the DATA, never of the
  * cluster geometry: the driver runs Verify at local[32]/32 shuffle
  * partitions, the specs at local[4]/4, and a production cluster at
  * thousands — a result that drifts with partition count is a latent
  * oracle mismatch.
  *
  * SCOPE: this battery varies REDUCE-side geometry only
  * (spark.sql.shuffle.partitions 3 vs 32). Scan-side/map-side geometry
  * (defaultParallelism, leaf split planning) is fixed by the shared
  * local[4] session and cannot be varied inside one JVM — that axis is
  * covered by the round-11 MANUAL probe (full Verify at CPUS=7 and
  * CPUS=32 against the DuckDB oracle, 167/167 both), which this spec
  * complements, not replaces.
  *
  * Representatives cover the classes where parallelism could plausibly
  * bite: float/decimal aggregation order, distributed argmax loops
  * (PageRank, BPE), sketch-routed exact counts (CMS heavy hitters),
  * pair-generating self-joins (weighted Jaccard, source overlap),
  * multi-pass histogram quantiles, and broadcast-tile kNN. Each runs at
  * shuffle.partitions = 3 and = 32 (bracketing the suite default 4) and
  * must produce byte-identical canonical rows.
  */
class ParallelismInvarianceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def canonAt(name: String, parts: Int): Seq[String] = {
    val conf = spark.conf
    val prev = conf.get("spark.sql.shuffle.partitions")
    val prevCoalesce = conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    conf.set("spark.sql.shuffle.partitions", parts.toString)
    // WITHOUT this, AQE coalesces both the 3-wide and the 32-wide run to
    // ~1 effective reduce partition at sf0.001 (everything is under the
    // 1 MB minPartitionSize) and the two runs aggregate in nearly the
    // same order — the battery would pass vacuously. Disabling
    // coalescing makes 3 and 32 the REAL reduce widths under test.
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try graft.SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toSeq.map(v => String.valueOf(v)).mkString("|"))
      .sorted.toSeq
    finally {
      conf.set("spark.sql.shuffle.partitions", prev)
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
  }

  private val representatives = Seq(
    "q02_pricing_summary" -> "decimal sums over a shuffled aggregate",
    "q68_exact_quantile" -> "multi-pass bit-histogram quantiles (partials tree-reduced)",
    "q97_heavy_hitters" -> "CMS-routed exact candidate verification",
    "q104_bm25" -> "double score sums + TakeOrdered tail",
    "q105_pagerank" -> "3 unrolled double-arithmetic power iterations",
    "q117_perplexity_buckets" -> "decimal NLL sums + per-lang tercile windows",
    "q121_bpe_merges" -> "distributed argmax merge loop",
    "q126_weighted_jaccard" -> "pair-generating self-join + integer weights",
    "q130_source_overlap" -> "distinct-shingle self-join (spread(8) pinned upstream)",
    "q157_knn_graph" -> "broadcast-tile scan + bounded heaps",
    "q179_bm25_eval" -> "r4-floored double ranking + integer DCG tail")

  representatives.foreach { case (name, why) =>
    test(s"$name identical at shuffle.partitions 3 and 32 ($why)") {
      val narrow = canonAt(name, 3)
      val wide = canonAt(name, 32)
      assert(narrow.nonEmpty, s"$name returned no rows at sf0.001")
      assert(narrow == wide,
        s"$name drifts with partition count: ${narrow.size} vs ${wide.size} rows, " +
          s"first diff ${narrow.zip(wide).find(p => p._1 != p._2)}")
    }
  }
}
