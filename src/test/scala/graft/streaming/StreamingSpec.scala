package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.SparkTestBase

/** Top-level so Spark can derive an Encoder without an outer scope. */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

/** B28: streaming jobs asserted equivalent to their batch forms on the
  * same rows (SURVEY §5.2.5), plus watermark late-data drop. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val rows = Seq(
    Ev(1, ts(5), 1, "click", 1.0), Ev(2, ts(20), 1, "click", 2.0),
    Ev(3, ts(65), 1, "view", 3.0), Ev(4, ts(70), 2, "click", 4.0),
    Ev(5, ts(130), 1, "click", 5.0), // >30min gap for user 1 -> new session
    Ev(6, ts(135), 2, "view", 6.0))

  private def runStream(job: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                        batches: Seq[Seq[Ev]]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"stream_out_${System.nanoTime()}"
    val q = job(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    // close all windows: a far-future event advances the watermark
    mem.addData(Ev(999, ts(24 * 60), 99, "x", 0.0))
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("tumbling stream equals batch date_trunc aggregation on same rows") {
    import spark.implicits._
    val got = runStream(Events.tumblingCounts(_), Seq(rows.take(3), rows.drop(3)))
      .where(col("event_type") =!= "x")
      .select("bucket_s", "event_type", "n_events", "sum_value")
      .orderBy("bucket_s", "event_type")
      .collect().toSeq
    val want = rows.toDF()
      .groupBy(unix_seconds(date_trunc("hour", col("ts"))).as("bucket_s"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy("bucket_s", "event_type")
      .collect().toSeq
    assert(got == want)
  }

  test("watermark drops late events from closed windows") {
    import spark.implicits._
    // batch 1 advances watermark to 130-10=120min; a then-arriving event at
    // minute 15 lands in the [0,60) window, which is closed -> dropped
    val late = Ev(7, ts(15), 1, "click", 9.0)
    val got = runStream(Events.tumblingCounts(_), Seq(rows, Seq(late)))
      .where(col("event_type") === "click" && col("bucket_s") === 1704067200L)
      .select("n_events").as[Long].collect().toSeq
    assert(got == Seq(2L)) // the two on-time clicks; the late one is gone
  }

  test("streaming dedup: cross-batch duplicates dropped, first record wins") {
    import spark.implicits._
    // batch 1 = events 1-3 (max ts 01:05 -> watermark 00:55 for batch 2).
    // dup3 is the load-bearing case: ON-TIME (01:06 >= 00:55) duplicate of
    // key 3 whose dedup state (expires 01:15) survives into batch 2 — only
    // cross-batch state can drop it, and its different payload proves the
    // FIRST record won. dup2 covers the late-arrival path (below the
    // watermark, removed by the lateness filter before state is consulted)
    // and dup4 a same-batch exact replay.
    val dup3 = Ev(3, ts(66), 2, "click", 99.0)
    val dup2 = Ev(2, ts(21), 1, "view", 99.0)
    val dup4 = Ev(4, ts(70), 2, "click", 4.0)
    val got = runStream(Events.dedupedEvents(_, Seq("event_id")),
        Seq(rows.take(3), Seq(dup3, dup2, dup4) ++ rows.drop(3)))
      .where(col("event_id") =!= 999)
      .select("event_id", "event_type", "value")
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val want = rows.map(e => (e.event_id, e.event_type, e.value))
      .sortBy(_._1)
    assert(got == want, s"got $got")
  }

  test("session stream equals batch sessionization on same rows") {
    import spark.implicits._
    val got = runStream(Events.sessionCounts(_), Seq(rows))
      .where(col("user_id") =!= 99)
      .select("user_id", "session_start_s", "n_ev")
      .orderBy("user_id", "session_start_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // batch truth: user 1 sessions {5,20}, {65}, {130}; user 2 {70,135->
    // gap 65min -> two sessions {70}, {135}}
    val want = Seq(
      (1L, tsSec(5), 2L), (1L, tsSec(65), 1L), (1L, tsSec(130), 1L),
      (2L, tsSec(70), 1L), (2L, tsSec(135), 1L))
    assert(got == want)
  }

  private def tsSec(minute: Int): Long = 1704067200L + minute * 60L

  test("session_window boundary: a gap of exactly 30 min MERGES; 30min1s splits") {
    // load-bearing for q67's oracle (new session iff diff > gap, strictly):
    // Spark merges session windows that touch or overlap, so [t, t+30) and
    // [t+30, ...) DO merge
    import spark.implicits._
    val justOver = Timestamp.valueOf("2024-01-01 01:00:01") // 30:01 after #2
    val boundary = Seq(
      Ev(1, ts(0), 1, "click", 1.0),
      Ev(2, ts(30), 1, "click", 1.0), // exactly 30:00 later -> same session
      Ev(3, justOver, 1, "click", 1.0)) // 30min 1s after #2 -> new session
    val got = Events.sessionCounts(boundary.toDF())
      .orderBy("session_start_s")
      .select("user_id", "session_start_s", "n_ev")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, tsSec(0), 2L), (1L, tsSec(60) + 1L, 1L)))
  }

  test("foreachBatch JSONL sink: per-batchId overwrite makes replays idempotent") {
    // the reference's record-at-a-time 'a+' JSONL append (utils.py:361-365)
    // as a streaming sink. foreachBatch is at-least-once, so a blind
    // append would duplicate a replayed batch; writing each batch to a
    // batch=<id> subdirectory with mode=overwrite makes the replay
    // idempotent — the streaming analog of the reference's per-record
    // offsets. Fixed output path (repo temp-dir discipline): reruns
    // overwrite the same batch dirs instead of leaking copies.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_sink_spec").toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    def writeBatch(batch: org.apache.spark.sql.DataFrame, bid: Long): Unit =
      batch.write.mode("overwrite").json(s"$out/batch=$bid")
    val q = mem.toDF().select(col("event_id"), col("user_id"), col("value"))
      .writeStream
      .foreachBatch(writeBatch _)
      .outputMode("append").start()
    mem.addData(rows.take(3): _*); q.processAllAvailable()
    mem.addData(rows.drop(3): _*); q.processAllAvailable()
    q.stop()
    // simulate an at-least-once replay of the last batch: same id, same
    // rows -> overwrite leaves the union unchanged
    writeBatch(rows.drop(3).toDF()
      .select(col("event_id"), col("user_id"), col("value")), 1L)
    val back = spark.read.schema("event_id LONG, user_id LONG, value DOUBLE")
      .json(s"$out/batch=*").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(back == rows.map(e => (e.event_id, e.user_id, e.value)).sortBy(_._1))
  }

  test("session_window equals an independent gap-semantics reference on seeded random events") {
    // 400 events, 5 users, seeded gaps straddling the 30-min boundary
    // (including exact-boundary multiples) — an independent fold
    // implementing merge-iff-gap<=30min must agree with session_window on
    // every (user, session_start, count)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val evs = (1 to 400).map { i =>
      val user = 1L + rnd.nextInt(5)
      // gaps in seconds: mix of small, near-boundary, exact 1800, large
      val base = rnd.nextInt(5) match {
        case 0 => rnd.nextInt(300)
        case 1 => 1795 + rnd.nextInt(10) // straddles 1800
        case 2 => 1800
        case 3 => 3600 + rnd.nextInt(600)
        case _ => rnd.nextInt(2400)
      }
      (i.toLong, user, base.toLong)
    }
    // cumulative per-user timestamps from the gap sequence
    val byUser = evs.groupBy(_._2).flatMap { case (u, es) =>
      var t = 0L
      es.map { case (id, _, gap) => t += gap; (id, u, t) }
    }.toSeq
    val df = byUser.map { case (id, u, sec) =>
      Ev(id, new Timestamp(1704067200000L + sec * 1000L), u, "e", 1.0)
    }.toDF()
    val got = Events.sessionCounts(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // reference: per user, sort by time, new session when gap > 1800 s
    val want = byUser.groupBy(_._2).flatMap { case (u, es) =>
      val sorted = es.map(_._3).sorted
      val sessions = sorted.foldLeft(List.empty[List[Long]]) {
        case (Nil, t) => List(List(t))
        case (cur :: done, t) if t - cur.head <= 1800L => (t :: cur) :: done
        case (acc, t) => List(t) :: acc
      }
      sessions.map(s => (u, 1704067200L + s.last, s.size.toLong))
    }.toSet
    assert(got == want)
  }

  test("transformWithState event-time timer closes a session when the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Timestamp)]
      val name = s"timer_out_${System.nanoTime()}"
      val withWm = mem.toDS().toDF("user_id", "ts")
        .withWatermark("ts", "1 second")
        .as[(Long, Timestamp)]
      val q = Events.sessionCloseEventsV2(withWm).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      // user 1's session (05-20) gets a timer at 20min + 30min gap = 50min
      mem.addData((1L, ts(5)), (1L, ts(20)))
      q.processAllAvailable()
      // flush events from OTHER users push the watermark past 50min; the
      // third batch runs with that watermark and fires user 1's timer —
      // the close needs NO successor event from user 1 (v1 can't do this)
      mem.addData((99L, ts(120)))
      q.processAllAvailable()
      mem.addData((98L, ts(130)))
      q.processAllAvailable()
      q.stop()
      val got = spark.table(name)
        .select("user_id", "start_us", "end_us", "n_ev")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val us = (m: Int) => ts(m).getTime * 1000L
      assert(got.contains((1L, us(5), us(20), 2L)), s"timer close missing: $got")
      // users 98/99 have open sessions whose timers never fired: no closes
      assert(!got.exists(r => r._1 == 98L || r._1 == 99L), s"premature close: $got")
    } finally prevProvider match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("MapState histogram and capped ListState accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, String, Long)]
      val name = s"act_out_${System.nanoTime()}"
      val q = Events.userActivity(mem.toDS(), keepRecent = 3).writeStream
        .format("memory").queryName(name).outputMode("update").start()
      mem.addData((1L, "click", 10L), (1L, "view", 20L), (1L, "click", 30L))
      q.processAllAvailable()
      // batch 2: map must carry {click:2, view:1} over; list is at cap 3
      // and two more events must trim it back to 3
      mem.addData((1L, "buy", 40L), (1L, "click", 50L))
      q.processAllAvailable()
      q.stop()
      val last = spark.table(name)
        .groupBy("user_id")
        .agg(max_by(struct("n_types", "total", "recent_kept"), col("total")).as("s"))
        .select("user_id", "s.n_types", "s.total", "s.recent_kept")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      // 3 distinct types, 5 events total, ring capped at 3
      assert(last == Seq((1L, 3L, 5L, 3L)))
    } finally prevProvider match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("file-source stream (JSONL directory, Trigger.AvailableNow) matches the batch transform") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    // the production source shape: a directory new JSONL files land in,
    // schema EXPLICIT (streaming sources must never infer)
    val dir = java.nio.file.Files.createTempDirectory("graft-filestream").toString
    val (b1, b2) = (rows.take(3), rows.drop(3))
    b1.toDF().write.mode("append").json(dir)
    b2.toDF().write.mode("append").json(dir)
    val schema = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
    val name = s"filesrc_out_${System.nanoTime()}"
    val q = Events.tumblingCounts(
        spark.readStream.schema(schema).json(dir))
      .writeStream.format("memory").queryName(name)
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table(name)
      .groupBy("bucket_s", "event_type")
      .agg(max_by(struct("n_events", "sum_value"), col("n_events")).as("s"))
      .select("bucket_s", "event_type", "s.n_events", "s.sum_value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = Events.tumblingCounts(rows.toDF())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == batch, s"file-source stream diverged: $got vs $batch")
    assert(batch.nonEmpty)
  }

  test("checkpointed file sink is exactly-once across query restarts") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val src = java.nio.file.Files.createTempDirectory("graft-ckpt-src").toString
    val out = java.nio.file.Files.createTempDirectory("graft-ckpt-out").toString + "/data"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-meta").toString
    val schema = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
    def run(): Unit = {
      val q = spark.readStream.schema(schema).json(src)
        .select("event_id", "user_id", "event_type")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000); q.stop()
    }
    rows.take(3).toDF().write.mode("append").json(src)
    run() // first incarnation consumes batch 1
    rows.drop(3).toDF().write.mode("append").json(src)
    run() // restart from the SAME checkpoint: only the new files process
    val ids = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    // every event exactly once — a re-read of batch 1 after restart (lost
    // offset tracking) would surface as duplicate ids here
    assert(ids == rows.map(_.event_id).sorted, s"not exactly-once: $ids")
  }

  test("stream-stream interval join matches the batch join on the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      Ev(10, ts(10), 1, "view", 1.0),
      Ev(11, ts(12), 1, "click", 1.0),  // 2 min after view 10 -> match
      Ev(12, ts(40), 1, "click", 1.0),  // 30 min after view 10 -> too late
      Ev(20, ts(20), 2, "view", 1.0),
      Ev(21, ts(33), 2, "click", 1.0),  // 13 min after view 20 -> match
      Ev(22, ts(33), 3, "click", 1.0))  // other user -> no match
    val mem = MemoryStream[Ev]
    val name = s"ssjoin_out_${System.nanoTime()}"
    val streamDf = mem.toDF()
    val q = Events.clicksAfterViews(
        streamDf.where(col("event_type") === "click"),
        streamDf.where(col("event_type") === "view"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    mem.addData(evs: _*); q.processAllAvailable()
    // advance BOTH sides' watermarks: the flush events must survive the
    // click/view filters (which run upstream of withWatermark), and use
    // distinct partner-less users so they add no join rows
    mem.addData(Ev(998, ts(24 * 60), 98, "click", 0.0),
      Ev(999, ts(24 * 60), 97, "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name)
      .select("user_id", "view_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 10L, 11L), (2L, 20L, 21L)))
    // batch form of the SAME transform on the same rows agrees
    val batch = Events.clicksAfterViews(
        evs.toDF().where(col("event_type") === "click"),
        evs.toDF().where(col("event_type") === "view"))
      .select("user_id", "view_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch == got)
  }

  test("flatMapGroupsWithState: session closes emitted across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)] // (user, ts_us)
    val name = s"closes_out_${System.nanoTime()}"
    val M = 60000000L // one minute in us
    val q = Events.sessionCloseEvents(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    // batch 1: user 1 session {0,5}; gap 40min -> closes it; new session {45}
    mem.addData((1L, 0L), (1L, 5 * M), (1L, 45 * M))
    q.processAllAvailable()
    // batch 2: user 1 event at 50min extends open session; event at 100min
    // closes {45,50}; user 2 opens (never closes - stays in state)
    mem.addData((1L, 50 * M), (1L, 100 * M), (2L, 0L))
    q.processAllAvailable()
    // batch 3: a too-late event at 10min (more than gap before the open
    // session at 100min) is emitted immediately as its own closed session
    // instead of corrupting the open session's bounds
    mem.addData((1L, 10 * M))
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, 0L, 5 * M, 2L),        // closed inside batch 1
      (1L, 45 * M, 50 * M, 2L),   // state {45} crossed batches, extended, closed
      (1L, 10 * M, 10 * M, 1L)))  // late arrival: own single-event session
  }

  test("mapGroupsWithState: per-user running totals accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val name = s"state_out_${System.nanoTime()}"
    val q = Events.runningUserTotals(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    mem.addData((1L, 100L, 1.0), (1L, 200L, 2.0), (2L, 150L, 5.0))
    q.processAllAvailable()
    mem.addData((1L, 300L, 4.0))
    q.processAllAvailable()
    q.stop()
    // last snapshot per user: state carried over from batch 1 into batch 2
    val last = spark.table(name)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max_by(
        org.apache.spark.sql.functions.struct("n_events", "total_value", "last_ts_us"),
        org.apache.spark.sql.functions.col("n_events")).as("s"))
      .select("user_id", "s.n_events", "s.total_value", "s.last_ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(last == Seq((1L, 3L, 7.0, 300L), (2L, 1L, 5.0, 150L)))
  }

  test("transformWithState (state API v2) matches the mapGroupsWithState twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // state API v2 requires the RocksDB provider; scope it to this query
    // and restore the session default afterwards
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Long, Double)]
      val name = s"tws_out_${System.nanoTime()}"
      val q = Events.runningUserTotalsV2(mem.toDS()).writeStream
        .format("memory").queryName(name).outputMode("update").start()
      mem.addData((1L, 100L, 1.0), (1L, 200L, 2.0), (2L, 150L, 5.0))
      q.processAllAvailable()
      mem.addData((1L, 300L, 4.0)) // cross-batch: user 1 state must carry over
      q.processAllAvailable()
      q.stop()
      val last = spark.table(name)
        .groupBy("user_id")
        .agg(max_by(struct("n_events", "total_value", "last_ts_us"),
          col("n_events")).as("s"))
        .select("user_id", "s.n_events", "s.total_value", "s.last_ts_us")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      // identical snapshots to the v1 (mapGroupsWithState) test above
      assert(last == Seq((1L, 3L, 7.0, 300L), (2L, 1L, 5.0, 150L)))
    } finally prevProvider match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
