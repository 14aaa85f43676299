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

  test("q158: attribution matches a sequential carry-forward replay and " +
       "conserves total purchase revenue") {
    val evs = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)"),
        col("event_id"), col("value"),
        expr("CAST(get_json_object(props, '$.k') AS BIGINT) % 4").as("k4"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    def d4(x: Double): BigDecimal =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val attributed = evs.groupBy(_._1).values.flatMap { es =>
      var lastCh: Option[String] = None
      es.sortBy(e => (e._3, e._4)).flatMap { e =>
        if (e._2 == "click") { lastCh = Some(s"ch${e._6}"); None }
        else if (e._2 == "purchase") Some((lastCh.getOrElse("(none)"), e._5))
        else None
      }
    }.toSeq
    val expected = attributed.groupBy(_._1).toSeq.map { case (ch, rows) =>
      (ch, rows.length.toLong, rows.map(r => d4(r._2)).sum.toDouble)
    }.sortBy(_._1)
    val got = AnalyticsQueries.q158LastTouchAttribution(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
    // revenue conservation: every purchase lands in exactly one bucket
    val total = attributed.map(r => d4(r._2)).sum.toDouble
    assert(math.abs(got.map(_._3).sum - total) < 1e-9)
    assert(got.map(_._2).sum == evs.count(_._2 == "purchase").toLong)
  }

  test("q158 plan: the carry-forward is one user-keyed window — no as-of " +
       "join against the click stream") {
    val p = plan("q158_last_touch_attribution")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("user_id")), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"attribution must not join streams:\n$p")
  }

  test("q159: anomaly flags match a from-scratch trailing-window replay " +
       "and early hours with empty baselines are excluded") {
    val hrs = events().map(_._3 / 1000000L / 3600L)
    val counts = hrs.groupBy(identity).map { case (h, v) => (h, v.size.toLong) }
    val expected = counts.toSeq.sortBy(_._1).flatMap { case (h, n) =>
      val base = counts.filter { case (b, _) => b >= h - 24 && b <= h - 1 }.values.toSeq
      if (base.isEmpty) None
      else {
        val bn = base.length.toLong
        val bsum = base.sum
        val bsq = base.map(x => x * x).sum
        val mean = bsum.toDouble / bn
        val sigma = math.sqrt((bsq.toDouble - bsum.toDouble * bsum.toDouble / bn) / bn + 1.0)
        Some((h, n, r4(mean), r4((n.toDouble - mean) / sigma),
          math.abs(n.toDouble - mean) > 3.0 * sigma))
      }
    }
    val got = AnalyticsQueries.q159VolumeAnomalies(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4))).toSeq
    assert(got == expected)
  }

  test("q159 plan: the trailing window consumes the hourly aggregate, " +
       "never the event stream (corpus work is one map-side count)") {
    val p = plan("q159_volume_anomalies")
    assert(p.contains("HashAggregate"), p)
    val n = p.linesIterator.count(_.contains(") Exchange"))
    assert(n <= 3, s"expected agg + bounded-window + sort exchanges only, got $n:\n$p")
  }

  test("q161: SCD2 intervals match a sequential run-collapse replay, " +
       "versions are contiguous and intervals chain exactly") {
    val evs = Tables.load(spark, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_id"),
        expr("concat('tier', CAST(CAST(get_json_object(props, '$.k') AS BIGINT) % 3 AS STRING))"),
        expr("unix_millis(ts)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ordered = es.sortBy(e => (e._2, e._3))
      val kept = ordered.zipWithIndex.filter { case (e, i) =>
        i == 0 || e._4 != ordered(i - 1)._4 }.map(_._1)
      kept.zipWithIndex.map { case (e, v) =>
        val toMs = if (v + 1 < kept.length) Some(kept(v + 1)._5) else None
        (u, v + 1L, e._4, e._5, toMs)
      }
    }.sortBy(r => (r._1, r._2))
    val got = AnalyticsQueries.q161Scd2History(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(got == expected)
    // structural invariants: contiguous versions, chained intervals, one
    // open (NULL) interval per user, no zero-length run collapse misses
    got.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2) == (1L to sorted.length))
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._5.contains(b._4), s"interval gap: $a -> $b")
          assert(a._3 != b._3, s"uncollapsed run: $a -> $b")
        case _ => ()
      }
      assert(sorted.last._5.isEmpty)
    }
  }

  test("q161 plan: all three window passes ride one user-keyed exchange") {
    val p = plan("q161_scd2_history")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("user_id")), p)
    val userExchanges = p.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") && l.contains("user_id")).size
    assert(userExchanges <= 1, s"windows re-shuffled ($userExchanges):\n$p")
  }

  test("q163: per-node counts match a brute-force triple scan, and K4 " +
       "yields its four known triangles") {
    import spark.implicits._
    // brute replay on the synthesized graph
    val edges = Tables.load(spark, dir, "documents")
      .selectExpr("LEAST(doc_id % 50, ((doc_id % 50) + (doc_id % 7) + 1) % 50) AS u",
        "GREATEST(doc_id % 50, ((doc_id % 50) + (doc_id % 7) + 1) % 50) AS v")
      .where(col("u") =!= col("v")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    def adj(a: Long, b: Long) = edges((a min b, a max b))
    val expected = nodes.map { n =>
      val cnt = (for {
        a <- nodes; if a != n && adj(n, a)
        b <- nodes; if b > a && b != n && adj(n, b) && adj(a, b)
      } yield 1).size.toLong
      (n, edges.count(e => e._1 == n || e._2 == n).toLong, cnt)
    }
    val got = AnalyticsQueries.q163TriangleCount(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.map(_._3).sum > 0, "the synthesized graph must contain triangles")
    // hand case: K4 — every node has degree 3 and sits in 3 triangles
    val k4 = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
      .toDF("u", "v")
    val gotK4 = AnalyticsQueries.triangleCounts(k4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotK4 == Seq((0L, 3L, 3L), (1L, 3L, 3L), (2L, 3L, 3L), (3L, 3L, 3L)))
  }

  test("q163 plan: wedge build and closure are equi-joins — no cartesian, " +
       "no nested-loop fallback") {
    val p = plan("q163_triangle_count")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("LeftSemi"), s"the closure must be a semi-join:\n$p")
  }

  test("q164: support/confidence/lift match a from-scratch basket replay " +
       "and the min-supp cut is exact") {
    val ob = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val n = ob.map(_._1).distinct.length.toLong
    val brandCnt = ob.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairs = ob.groupBy(_._1).values.flatMap { rows =>
      val bs = rows.map(_._2).sorted
      for (i <- bs.indices; j <- i + 1 until bs.length) yield (bs(i), bs(j))
    }.toSeq.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val expected = pairs.toSeq.filter { case (_, c) => c * 50 >= n }
      .map { case ((a, b), c) =>
        val lift = (BigDecimal(c) * BigDecimal(n)).toDouble /
          (BigDecimal(brandCnt(a)) * BigDecimal(brandCnt(b))).toDouble
        (a, b, c, r4(c.toDouble / n), r4(c.toDouble / brandCnt(a)),
          r4(c.toDouble / brandCnt(b)), r4(lift))
      }.sortBy(t => (t._1, t._2))
    val got = AnalyticsQueries.q164AssociationRules(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "the min-supp cut must keep some brand pairs at this SF")
  }

  test("q164 plan: marginals and the basket total broadcast back into the " +
       "catalog-sized pair table (no corpus-sized shuffle after the pairs)") {
    val p = plan("q164_association_rules")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q165: the class-size distribution matches a from-scratch replay, " +
       "row mass is conserved and the cumulative share ends at 1.0") {
    val rows = Tables.load(spark, dir, "customer")
      .selectExpr("c_mktsegment", "CAST(c_nationkey AS LONG)",
        "CAST(floor(c_acctbal / 1000.0) AS LONG)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val classes = rows.groupBy(identity).values.map(_.length.toLong).toSeq
    val dist = classes.groupBy(identity).toSeq
      .map { case (sz, cs) => (sz, cs.length.toLong, cs.length.toLong * sz) }
      .sortBy(_._1)
    val total = dist.map(_._3).sum
    var cum = 0L
    val expected = dist.map { case (sz, nc, nr) =>
      cum += nr
      (sz, nc, nr, r4(cum.toDouble / total))
    }
    val got = AnalyticsQueries.q165KAnonymity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
    assert(got.map(_._3).sum == rows.length.toLong, "row mass must be conserved")
    assert(got.last._4 == 1.0, "the cumulative share must end at exactly 1.0")
  }

  test("q167: the latency summary matches a from-scratch chained-minima + " +
       "histogram-interpolation replay") {
    val byUser = events().groupBy(_._1)
    val lats = byUser.values.flatMap { es =>
      val t1 = es.filter(_._2 == "view").map(_._3).minOption
      val t2 = t1.flatMap(a => es.filter(e => e._2 == "click" && e._3 > a)
        .map(_._3).minOption)
      val t3 = t2.flatMap(a => es.filter(e => e._2 == "purchase" && e._3 > a)
        .map(_._3).minOption)
      for (a <- t1; c <- t3) yield (c - a) / 3600000000L
    }.toSeq
    val n = lats.length.toLong
    val bins = lats.groupBy(h => math.min(h / 24, 15L)).view
      .mapValues(_.length.toLong).toSeq.sortBy(_._1)
    def quant(q: Double): Double = {
      var cum = 0L
      bins.collectFirst {
        case (bin, cnt) if { cum += cnt; cum.toDouble >= q * n } =>
          bin * 24.0 + (q * n - (cum - cnt)) / cnt * 24.0
      }.get
    }
    val expected = (n, lats.min, lats.max, r4(lats.sum.toDouble / n),
      r4(quant(0.5)), r4(quant(0.9)))
    val got = AnalyticsQueries.q167ConversionLatency(spark, dir).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getDouble(3),
      got.getDouble(4), got.getDouble(5)) == expected)
    assert(n > 0, "some users must fully convert at this SF")
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
