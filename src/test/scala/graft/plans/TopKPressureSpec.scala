package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkTestBase

/** Forced-pressure test for the round-12 memory contract: under a tiny
  * `spark.graft.topk.budgetBytes` a HIGH-CARDINALITY key space must not
  * grow heap state past the budget — the partial stage freezes its key
  * set and streams the rest through, the final stage degrades to the
  * external sort group-limit (spilling runs to disk) — and the output
  * must STILL equal the window row_number twin exactly. This is the
  * per-user-top-k-over-many-users shape the r11 verdict flagged as a
  * latent OOM; `SpillDisciplineSpec` covers only built-in buffered
  * operators, so the custom operator gets its own pressure harness. */
class TopKPressureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def finalPlan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  private def collectTopK(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[TopKPerKeyExec] = {
    val here = p.collect { case e: TopKPerKeyExec => e }
    val inStages = p.collect {
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectTopK(s.plan)
    }.flatten
    here ++ inStages
  }

  /** 20k rows / 5k distinct groups (4 rows each), deterministic values:
    * the key map, not the per-key heaps, is what blows the budget — and
    * EVERY partition of the range carries far more than the test budget,
    * so the partial stage must trip regardless of input splits. */
  private def grouped = spark.range(0, 20000)
    .select((col("id") / 4).cast("long").as("grp"),
      col("id").as("event_id"),
      (col("id") * 2654435761L % 1000).cast("double").as("value"))

  test("tiny budget + high-cardinality keys: exact result, both stages " +
    "degrade, final stage spills, spill files are reclaimed") {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    def spillFiles() = Option(tmp.listFiles()).getOrElse(Array.empty)
      .count(_.getName.startsWith("graft-topk-spill"))
    spark.conf.set(TopK.BudgetConfKey, (16 * 1024).toString)
    try {
      val before = spillFiles()
      val df = TopK.perKey(grouped, Seq("grp"),
        Seq(col("value").desc, col("event_id")), k = 2)
      // collect df ITSELF: a .select() would execute a fresh query with
      // fresh exec instances and the metric asserts would read zeros
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val w = Window.partitionBy("grp").orderBy(col("value").desc, col("event_id"))
      val twin = grouped.withColumn("rn", row_number().over(w)).where(col("rn") <= 2)
        .select("grp", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == twin,
        s"degraded path diverged: custom-only=${got -- twin}, twin-only=${twin -- got}")
      assert(got.nonEmpty)

      val Seq(finalExec, partialExec) = collectTopK(finalPlan(df)).sortBy(_.partial)
      assert(partialExec.metrics("fallbackTasks").value >= 1,
        "partial stage never hit the budget — pressure harness lost its pressure")
      assert(finalExec.metrics("fallbackTasks").value >= 1,
        "final stage never degraded to the sort fallback")
      assert(finalExec.metrics("spillBytes").value > 0,
        "sort fallback never spilled a run — budget too large for the fixture?")
      assert(spillFiles() <= before,
        "spill run files leaked past the merge (EOF-delete or completion listener broken)")
    } finally spark.conf.unset(TopK.BudgetConfKey)
  }

  test("default budget on the same input: no degradation, pure heap path") {
    val df = TopK.perKey(grouped, Seq("grp"),
      Seq(col("value").desc, col("event_id")), k = 2)
    df.collect()
    collectTopK(finalPlan(df)).foreach { e =>
      assert(e.metrics("fallbackTasks").value == 0,
        s"partial=${e.partial} degraded under the DEFAULT budget")
      assert(e.metrics("spillBytes").value == 0)
    }
  }

  test("replace path accounts byte growth: better-ranked rows are BIGGER " +
    "(size-correlated score) — budget still trips and the result stays exact") {
    // 100 keys × k=2 and ASCENDING scores with size-correlated payloads:
    // the per-key heaps fill with tiny early rows, then every later row
    // REPLACES a retained row with a strictly larger one. Pre-fix the
    // replace path adjusted `bytes` but never re-checked the budget, so
    // state grew toward keys×k×maxRowSize with the guard never firing.
    spark.conf.set(TopK.BudgetConfKey, (64 * 1024).toString)
    try {
      val sized = spark.range(0, 20000).select(
        (col("id") % 100).as("grp"),
        col("id").as("event_id"),
        col("id").as("score"),
        expr("repeat('x', CAST(id / 20 AS INT))").as("pad"))
      val df = TopK.perKey(sized, Seq("grp"),
        Seq(col("score").desc, col("event_id")), k = 2)
      // collect df ITSELF (not a .select) so the metric asserts read the
      // execs that actually ran
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = Window.partitionBy("grp").orderBy(col("score").desc, col("event_id"))
      val twin = sized.withColumn("rn", row_number().over(w)).where(col("rn") <= 2)
        .select("grp", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == twin,
        s"replace-path degradation diverged: custom-only=${got -- twin}, " +
          s"twin-only=${twin -- got}")
      val Seq(_, partialExec) = collectTopK(finalPlan(df)).sortBy(_.partial)
      assert(partialExec.metrics("fallbackTasks").value >= 1,
        "replace-path growth never tripped the budget — the size-correlated " +
          "accounting hole is back")
    } finally spark.conf.unset(TopK.BudgetConfKey)
  }

  test("global top-k (empty key) still heaps under a tiny budget " +
    "(single-key state cannot overflow)") {
    spark.conf.set(TopK.BudgetConfKey, (16 * 1024).toString)
    try {
      val df = TopK.perKey(grouped, Nil, Seq(col("value").desc, col("event_id")), k = 5)
      val got = df.select("event_id").collect().map(_.getLong(0)).toSet
      val twin = grouped.orderBy(col("value").desc, col("event_id"))
        .limit(5).select("event_id").collect().map(_.getLong(0)).toSet
      assert(got == twin)
    } finally spark.conf.unset(TopK.BudgetConfKey)
  }

  test("external sorter: groups exactly, orders within group, " +
    "spills and merges across many runs") {
    // unit-level: bytes-keyed entries through a 1 KB budget force several
    // runs; the merged stream must come back grouped by key bytes with
    // ascending order inside each group
    val metric = org.apache.spark.sql.execution.metric.SQLMetrics
      .createSizeMetric(spark.sparkContext, "test spill")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType)))
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(schema)
    val ord = org.apache.spark.sql.catalyst.expressions.RowOrdering.createNaturalAscendingOrdering(
      Seq(org.apache.spark.sql.types.LongType))
    val sorter = new ExternalGroupLimitSorter(1, ord, 1024L, metric)
    val rnd = new scala.util.Random(42)
    val inserted = (1 to 2000).map { _ =>
      val key = s"k${rnd.nextInt(50)}".getBytes("UTF-8")
      val v = rnd.nextInt(1000).toLong
      val row = proj(org.apache.spark.sql.catalyst.InternalRow(v)).copy()
      sorter.insert(key, row)
      (new String(key, "UTF-8"), v)
    }
    val out = sorter.sortedIterator().map(e =>
      (new String(e.key, "UTF-8"), e.row.getLong(0))).toList
    assert(out.size == inserted.size)
    // same multiset
    assert(out.groupBy(identity).view.mapValues(_.size).toMap ==
      inserted.groupBy(identity).view.mapValues(_.size).toMap)
    // grouped: each key appears in exactly one contiguous range
    val keySeq = out.map(_._1)
    val firstLast = keySeq.zipWithIndex.groupBy(_._1).view
      .mapValues(v => (v.map(_._2).min, v.map(_._2).max, v.size)).toMap
    firstLast.foreach { case (k, (lo, hi, n)) =>
      assert(hi - lo + 1 == n, s"key $k not contiguous in merged output")
    }
    // ordered within each group
    out.groupBy(_._1).foreach { case (k, vs) =>
      assert(vs.map(_._2) == vs.map(_._2).sorted, s"key $k not ordered")
    }
    assert(metric.value > 0, "1 KB budget over 2000 entries must have spilled")
  }
}
