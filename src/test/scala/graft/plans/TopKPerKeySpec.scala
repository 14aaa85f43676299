package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkTestBase
import graft.rel.Tables

/** The tier-(c) custom operator: result parity with the window twin,
  * the planned partial→exchange→final shape, and the map-side shuffle
  * reduction that is the operator's reason to exist. */
class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** The truly-executed plan (AQE wraps it until the query runs). */
  private def finalPlan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  /** Collect custom execs ACROSS AQE query-stage boundaries (a materialized
    * ShuffleQueryStageExec holds its subtree as a member, not a child, so
    * plain TreeNode.collect stops at the stage). */
  private def collectTopK(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[TopKPerKeyExec] = {
    val here = p.collect { case e: TopKPerKeyExec => e }
    val inStages = p.collect {
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectTopK(s.plan)
    }.flatten
    here ++ inStages
  }

  private def events = Tables.load(spark, SparkTestBase.Sf0001, "events")
    .select(col("event_id").cast("long").as("event_id"),
      col("user_id").cast("long").as("user_id"), col("value"))

  test("top-3 per user equals the Window row_number twin (set semantics)") {
    val custom = TopK.perKey(events, Seq("user_id"),
        Seq(col("value").desc, col("event_id")), k = 3)
      .select("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    val twin = events.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(custom == twin,
      s"custom-only=${custom -- twin}, twin-only=${twin -- custom}")
    assert(custom.nonEmpty)
  }

  test("plans as partial heaps -> one hash exchange on the key -> final heaps") {
    val df = TopK.perKey(events, Seq("user_id"), Seq(col("value").desc), k = 2)
    df.collect()
    val plan = finalPlan(df)
    val execs = collectTopK(plan)
    assert(execs.map(_.partial).sorted == Seq(false, true),
      s"expected one partial + one final exec, got $execs")
    val planStr = df.queryExecution.toString
    // the exchange EnsureRequirements inserted between them clusters on
    // the top-k key, not on anything else
    assert(planStr.contains("hashpartitioning(user_id"), planStr)
  }

  test("partial heaps cut what reaches the exchange (the map-side win)") {
    val k = 2
    // narrow key domain (few event types): many rows per (partition, key)
    // -> the per-partition heaps discard almost everything map-side
    val typed = Tables.load(spark, SparkTestBase.Sf0001, "events")
      .select(col("event_type"), col("event_id").cast("long").as("event_id"),
        col("value"))
    val df = TopK.perKey(typed, Seq("event_type"),
      Seq(col("value").desc, col("event_id")), k = k)
    df.collect()
    val Seq(finalRetained, partialRetained) = collectTopK(finalPlan(df))
      .sortBy(_.partial)
      .map(_.metrics("rowsRetained").value)
    val inputRows = events.count()
    assert(partialRetained < inputRows / 10,
      s"partial heaps retained $partialRetained of $inputRows — no map-side cut")
    // final output: exactly k per key (every key has >= k rows here)
    val nKeys = typed.select(countDistinct(col("event_type"))).first().getLong(0)
    assert(finalRetained == nKeys * k, s"final retained $finalRetained")
  }
}
