package graft.rel

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Round-9 product-analytics wave: independent Scala replays of the
  * declared semantics (the DuckDB hash gate checks the oracle twin; these
  * check the SEMANTICS against a from-scratch sequential
  * reimplementation) plus the plan pins that carry each query to event
  * streams much larger than the test table. */
class AnalyticsQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** Events in exact engine precision: (user_id, event_type, ts_micros,
    * event_id). */
  private def events(): Array[(Long, String, Long, Long)] =
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  private def r4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  test("q148: stage counts match a per-user sequential funnel replay") {
    val byUser = events().groupBy(_._1)
    // sequential chained minima in micros — the declared semantics
    val stages = byUser.values.map { es =>
      val t1 = es.filter(_._2 == "view").map(_._3).minOption
      val t2 = t1.flatMap(a => es.filter(e => e._2 == "click" && e._3 > a)
        .map(_._3).minOption)
      val t3 = t2.flatMap(a => es.filter(e => e._2 == "purchase" && e._3 > a)
        .map(_._3).minOption)
      (t1.isDefined, t2.isDefined, t3.isDefined)
    }.toSeq
    val n1 = stages.count(_._1).toLong
    val n2 = stages.count(_._2).toLong
    val n3 = stages.count(_._3).toLong
    val got = AnalyticsQueries.q148Funnel(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val expected = Seq(
      ("1_view", n1, r4(n1.toDouble / n1)),
      ("2_click", n2, r4(n2.toDouble / n1)),
      ("3_purchase", n3, r4(n3.toDouble / n1)))
    assert(got == expected)
    // ordered-funnel sanity: the funnel can only narrow
    assert(n1 >= n2 && n2 >= n3 && n3 >= 0)
  }

  test("q148 plan: one user-keyed exchange carries all three stage windows " +
       "(the chained minima never re-shuffle, and no window is global)") {
    val p = plan("q148_funnel")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("user_id")),
      s"every stage window must partition by user_id:\n${windows.mkString("\n")}")
    val userExchanges = p.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") && l.contains("user_id")).size
    assert(userExchanges <= 1,
      s"stage windows re-shuffled: $userExchanges user_id exchanges\n$p")
  }

  test("q149: the cohort triangle matches a from-scratch replay and " +
       "offset 0 always retains 1.0") {
    val epoch = java.time.LocalDate.of(2024, 1, 1)
    val wk = events().map { case (u, _, tsMicros, _) =>
      val d = java.time.Instant.ofEpochSecond(Math.floorDiv(tsMicros, 1000000L))
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
      (u, (java.time.temporal.ChronoUnit.DAYS.between(epoch, d) / 7).toInt)
    }
    val first = wk.groupBy(_._1).map { case (u, ws) => (u, ws.map(_._2).min) }
    val cells = wk.distinct.groupBy { case (u, w) => (first(u), w - first(u)) }
      .map { case (k, vs) => (k, vs.map(_._1).distinct.length.toLong) }
    val sizes = first.values.groupBy(identity).map { case (c, us) => (c, us.size.toLong) }
    val expected = cells.toSeq.map { case ((c, off), n) =>
      (c.toLong, off.toLong, n, sizes(c), r4(n.toDouble / sizes(c))) }.sorted
    val got = AnalyticsQueries.q149RetentionCohorts(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq.sorted
    assert(got == expected)
    got.filter(_._2 == 0L).foreach { row =>
      assert(row._5 == 1.0, s"offset-0 cell must retain its whole cohort: $row")
    }
  }

  test("q149 plan: cohort sizes join back broadcast (the catalog-sized " +
       "side never shuffles the cells)") {
    val p = plan("q149_retention_cohorts")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q150: the transition matrix matches a per-user sequential replay " +
       "and rows normalize to their source totals") {
    val pairs = events().groupBy(_._1).values.flatMap { es =>
      val ordered = es.sortBy(e => (e._3, e._4)).map(_._2)
      ordered.zip(ordered.drop(1))
    }.toSeq
    val cnt = pairs.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val tot = cnt.groupBy(_._1._1).map { case (s, m) => (s, m.values.sum) }
    val expected = cnt.toSeq.map { case ((s, d), n) =>
      (s, d, n, r4(n.toDouble / tot(s))) }.sorted
    val got = AnalyticsQueries.q150EventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
    assert(got == expected)
    // per-source counts fold back to the total transition count
    assert(got.map(_._3).sum == pairs.size.toLong)
  }

  test("q155: top paths match a per-user sequential trigram replay with " +
       "the declared tie-break") {
    val tris = events().groupBy(_._1).values.flatMap { es =>
      val ordered = es.sortBy(e => (e._3, e._4)).map(_._2)
      ordered.sliding(3).filter(_.length == 3).map(w => (w(0), w(1), w(2)))
    }.toSeq
    val cnt = tris.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val tot = cnt.values.sum
    val expected = cnt.toSeq
      .map { case ((a, b, c), n) => (s"$a>$b>$c", n, r4(n.toDouble / tot)) }
      .sortBy { case (path, n, _) => (-n, path) }.take(10)
    val got = AnalyticsQueries.q155EventPaths(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
  }

  test("q155 plan: the trigram LEADs share one user-keyed window and the " +
       "share denominator broadcasts (no unpartitioned window anywhere)") {
    val p = plan("q155_event_paths")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("user_id")),
      s"every window must partition by user_id:\n${windows.mkString("\n")}")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row total must broadcast:\n$p")
  }

  test("q150 plan: the LEAD window partitions by user_id and the " +
       "normalization window runs over the catalog-sized pair table only") {
    val p = plan("q150_event_transitions")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.exists(_.contains("user_id")),
      s"LEAD must partition by user_id:\n${windows.mkString("\n")}")
    assert(windows.forall(w => w.contains("user_id") || w.contains("src")),
      s"unexpected window partitioning:\n${windows.mkString("\n")}")
  }
}
