package graft.rel

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Memory-pressure discipline: the 100-TB claim is not just "the plan
  * shape is right" but "the operators SURVIVE working sets that exceed
  * memory". Spark's window/sort-merge-join/session-window buffers and
  * the object-hash aggregate all spill past configurable row
  * thresholds; this spec forces those thresholds to a handful of rows —
  * so every window partition, join buffer and agg map actually takes
  * its spill path — and asserts bit-identical results for a
  * representative query per operator family. A correctness dependence
  * on "the partition fit in memory" (ordering assumptions, in-memory
  * iterator reuse, non-commutative merges) fails HERE instead of on a
  * 1000-executor run.
  */
class SpillDisciplineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  /** Spill knobs → a handful of rows (defaults are 4096/2^31). */
  private val spillConfs = Seq(
    "spark.sql.windowExec.buffer.in.memory.threshold" -> "4",
    "spark.sql.windowExec.buffer.spill.threshold" -> "4",
    "spark.sql.sessionWindow.buffer.in.memory.threshold" -> "4",
    "spark.sql.sessionWindow.buffer.spill.threshold" -> "4",
    "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "4",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "4",
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "2",
    // (spark.shuffle.spill.numElementsForceSpillThreshold would extend the
    // forcing to shuffle writes, but it is a STATIC core conf — rejected
    // by RuntimeConfig.set — so it needs its own SparkContext; the SQL
    // row-buffer knobs above are the per-session-settable surface)
    // disable broadcast so joins actually take the buffered SMJ path
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

  private def canon(name: String): Seq[String] =
    graft.SparkEntry.queries(name)(spark, dir).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private def withSpill[A](f: => A): A = {
    val prev = spillConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
    spillConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // one representative per buffered-operator family
  private val representatives = Seq(
    "q11_window_rank" ->            "window buffer (running aggregates over user partitions)",
    "q63_window_distribution" -> "distribution windows (ntile/percent_rank need the whole partition)",
    "q79_range_frame" ->       "RANGE frame window buffer",
    "q03_join_5way" ->         "sort-merge join buffers (broadcast disabled)",
    "q07_asof_latest_order" -> "as-of join + keep-latest window",
    "q52_string_agg" ->        "object-hash aggregate sort-based fallback (collect_list/string agg)",
    "q67_session_window" ->    "session-window merge buffer",
    "q96_sequence_pack" ->     "packing windows (cumulative sums per source partition)",
    "q148_funnel" ->           "chained funnel stage windows",
    "q161_scd2_history" ->     "SCD2 LAG/LEAD window stack")

  test("the forced thresholds actually engage the spill path (spill bytes observed)") {
    @volatile var spilledBytes = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val tm = te.taskMetrics
        if (tm != null) spilledBytes += tm.memoryBytesSpilled + tm.diskBytesSpilled
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      withSpill(canon("q63_window_distribution"))
      // deterministic drain: poll until the async listener bus delivers
      // (a fixed sleep raced on loaded boxes)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (spilledBytes == 0L && System.nanoTime() < deadline) Thread.sleep(100)
      assert(spilledBytes > 0L,
        "no task reported spill bytes — the thresholds are not engaging, " +
          "so the equality tests below would be vacuous")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  representatives.foreach { case (name, why) =>
    test(s"$name unchanged under forced spilling ($why)") {
      val base = canon(name)
      val spilled = withSpill(canon(name))
      assert(base.nonEmpty)
      assert(spilled == base,
        s"$name diverged under forced spill: ${spilled.size} vs ${base.size} rows")
    }
  }
}
