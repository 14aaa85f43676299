package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.streaming.Analytics.{StageHit, UserEvent}

/** Streaming funnel (the analytics arm of B28): batch-parity with
  * declared q148 on the real events table under multi-batch event-time
  * slicing, plus the at-most-once-per-stage and causal-arrival
  * semantics. */
class AnalyticsStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def run(batches: Seq[Seq[UserEvent]]): Seq[(Long, Int, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[UserEvent]
      val name = s"funnel_out_${System.nanoTime()}"
      val q = Analytics.funnelStream(mem.toDS(), "view", "click", "purchase")
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    } finally prevProvider match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def tableEvents(): Array[UserEvent] =
    graft.rel.Tables.load(spark, SparkTestBase.Sf0001, "events")
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)"),
        col("event_id")).collect()
      .map(r => UserEvent(r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("streaming funnel matches batch q148's per-stage user counts under " +
       "3-batch event-time slicing") {
    val evs = tableEvents().sortBy(e => (e.ts_micros, e.event_id))
    val third = evs.length / 3
    val batches = Seq(evs.take(third).toSeq,
      evs.slice(third, 2 * third).toSeq, evs.drop(2 * third).toSeq)
    val hits = run(batches)
    // at most one hit per (user, stage)
    assert(hits.groupBy(h => (h._1, h._2)).values.forall(_.length == 1))
    val gotCounts = hits.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val batch = graft.rel.AnalyticsQueries.q148Funnel(spark, SparkTestBase.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(gotCounts.getOrElse(1, 0L) == batch("1_view"))
    assert(gotCounts.getOrElse(2, 0L) == batch("2_click"))
    assert(gotCounts.getOrElse(3, 0L) == batch("3_purchase"))
    assert(batch("1_view") > 0)
  }

  test("streaming funnel stage times equal the batch chained minima when " +
       "fed in event-time order") {
    val evs = tableEvents()
    val hits = run(Seq(evs.sortBy(e => (e.ts_micros, e.event_id)).toSeq))
    val gotTimes = hits.groupBy(_._1).view.mapValues(
      _.map(h => h._2 -> h._3).toMap).toMap
    // independent replay of q148's chained minima (the AnalyticsQueriesSpec
    // recipe) — every emitted time must match exactly
    evs.groupBy(_.user_id).foreach { case (u, es) =>
      val t1 = es.filter(_.event_type == "view").map(_.ts_micros).minOption
      val t2 = t1.flatMap(a => es.filter(e => e.event_type == "click" && e.ts_micros > a)
        .map(_.ts_micros).minOption)
      val t3 = t2.flatMap(a => es.filter(e => e.event_type == "purchase" && e.ts_micros > a)
        .map(_.ts_micros).minOption)
      val got = gotTimes.getOrElse(u, Map.empty)
      assert(got.get(1) == t1 && got.get(2) == t2 && got.get(3) == t3,
        s"user $u: got $got, expected ($t1, $t2, $t3)")
    }
  }

  test("streaming SCD2 emits exactly batch q161's closed intervals under " +
       "3-batch event-time slicing") {
    import Analytics.AttrObs
    import org.apache.spark.sql.functions.col
    val obs = graft.rel.Tables.load(spark, SparkTestBase.Sf0001, "events")
      .select(col("user_id"),
        expr("concat('tier', CAST(CAST(get_json_object(props, '$.k') AS BIGINT) % 3 AS STRING))"),
        expr("unix_micros(ts)"), expr("unix_millis(ts)"), col("event_id"))
      .collect()
      .map(r => AttrObs(r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(o => (o.ts_micros, o.event_id))
    val third = obs.length / 3
    val batches = Seq(obs.take(third).toSeq,
      obs.slice(third, 2 * third).toSeq, obs.drop(2 * third).toSeq)
    val got = {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val mem = MemoryStream[AttrObs]
        val name = s"scd2_out_${System.nanoTime()}"
        val q = Analytics.scd2Stream(mem.toDS())
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        q.stop()
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
            r.getLong(4))).toSet
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    val batch = graft.rel.AnalyticsQueries.q161Scd2History(spark, SparkTestBase.Sf0001)
      .collect().filter(!_.isNullAt(4))
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == batch,
      s"stream-only=${(got -- batch).take(3)}, batch-only=${(batch -- got).take(3)}")
    assert(batch.nonEmpty)
  }

  test("SCD2 stale straggler: an out-of-order observation from before the " +
       "open interval is ignored, never emitting an inverted [from, to)") {
    import Analytics.AttrObs
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[AttrObs]
      val name = s"scd2_ooo_${System.nanoTime()}"
      val q = Analytics.scd2Stream(mem.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      mem.addData(AttrObs(7L, "tierA", 1000L, 1L, 1L)); q.processAllAvailable()
      // a stale tierB from BEFORE the open interval must be dropped...
      mem.addData(AttrObs(7L, "tierB", 500L, 0L, 2L)); q.processAllAvailable()
      // ...and a genuine later change still closes normally
      mem.addData(AttrObs(7L, "tierC", 2000L, 2L, 3L)); q.processAllAvailable()
      q.stop()
      val rows = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
          r.getLong(4))).toSet
      assert(rows == Set((7L, 1L, "tierA", 1L, 2L)),
        s"stale straggler corrupted the history: $rows")
      rows.foreach { case (_, _, _, from, to) =>
        assert(to >= from, s"inverted interval emitted: [$from, $to)") }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("out-of-order cross-batch arrival: a late earlier view cannot " +
       "re-chain an already-admitted stage (causal semantics)") {
    val b1 = Seq(UserEvent(1L, "view", 100L, 1L), UserEvent(1L, "click", 200L, 2L))
    val b2 = Seq(UserEvent(1L, "view", 50L, 3L), // late, earlier view — ignored
      UserEvent(1L, "purchase", 150L, 4L)) // before the admitted click — no stage 3
    val hits = run(Seq(b1, b2))
    assert(hits.toSet == Set((1L, 1, 100L), (1L, 2, 200L)))
    // and a purchase after the admitted click does complete the funnel
    val hits2 = run(Seq(b1, Seq(UserEvent(1L, "purchase", 300L, 5L))))
    assert(hits2.toSet == Set((1L, 1, 100L), (1L, 2, 200L), (1L, 3, 300L)))
  }
}
