package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming jobs over the events stream (SURVEY B28). The
  * reference's only streaming analog is its append-only JSONL sink
  * (`utils.py:361-365`); these are the engine-capability extensions the
  * driver contract requires: watermarked tumbling/sliding aggregation
  * with late-data drop, and gap-based session windows.
  *
  * Each job is a pure `DataFrame => DataFrame` over a *streaming* input
  * (`readStream` source or MemoryStream in tests) — the identical
  * transform compiles to an incremental stateful plan under
  * `writeStream`, and to the batch plan when handed a batch DataFrame,
  * which is exactly how the specs assert batch-equivalence with the
  * declared queries q26/q27.
  */
object Events {

  /** Tumbling 1-hour counts per event type, 10-minute watermark: events
    * later than the watermark are dropped from their (closed) window.
    * State per open window only — scales with open-window count, not
    * stream length. */
  def tumblingCounts(events: DataFrame,
                     window_ : String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(unix_seconds(col("w.start")).as("bucket_s"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding windows (length, slide). */
  def slidingCounts(events: DataFrame,
                    length: String = "1 hour",
                    slide: String = "15 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), length, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_seconds(col("w.start")).as("bucket_s"), col("event_type"),
        col("n_events"))

  /** Gap-based session windows per user (the streaming twin of the batch
    * lag+cumsum sessionization, q26): `session_window` merges events
    * within `gap` into one growing window per key. */
  def sessionCounts(events: DataFrame,
                    gap: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_ev"))
      .select(col("user_id"),
        unix_seconds(col("w.start")).as("session_start_s"),
        col("n_ev"))

  /** Stream-stream interval join (attribution/funnel shape): each click is
    * joined to same-user views it follows within `maxDelay`. Both sides
    * carry watermarks AND the join condition bounds event time on both
    * sides, so Spark can evict join state — without the time bound the
    * view-side buffer would grow forever. Works identically on batch
    * DataFrames (watermark is a no-op there). */
  def clicksAfterViews(clicks: DataFrame, views: DataFrame,
                       watermark: String = "10 minutes",
                       maxDelay: String = "15 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val v = views.withWatermark("ts", watermark)
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
    c.join(v,
        col("user_id") === col("view_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr(s"interval $maxDelay"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        unix_seconds(col("view_ts")).as("view_s"),
        unix_seconds(col("click_ts")).as("click_s"))
  }

  /** Per-user running state snapshot. */
  final case class UserState(user_id: Long, n_events: Long, total_value: Double,
                             last_ts_us: Long)

  /** Custom streaming state via `mapGroupsWithState`: a per-user running
    * counter/total that survives across micro-batches — the API tier for
    * state that windowed aggregation can't express (cross-window
    * accumulators, custom eviction). State size is one small record per
    * active user; `ProcessingTimeTimeout` would bound it in production.
    */
  def runningUserTotals(events: Dataset[(Long, Long, Double)]): Dataset[UserState] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .mapGroupsWithState[UserState, UserState](GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(userId, 0L, 0.0, Long.MinValue))
          var n = prev.n_events
          var tot = prev.total_value
          var last = prev.last_ts_us
          rows.foreach { case (_, tsUs, v) =>
            n += 1; tot += v; if (tsUs > last) last = tsUs
          }
          val next = UserState(userId, n, tot, last)
          state.update(next)
          next
      }
  }

  /** State API v2 processor behind [[runningUserTotalsV2]]. Top-level
    * class (not an anonymous closure) so the checkpoint can re-instantiate
    * it; `ValueState` is fetched in `init` per the API contract. TTL is
    * NONE to keep parity with the v1 twin's NoTimeout; production would
    * pass `TTLConfig(Duration.ofDays(...))` to bound idle-user state. */
  final class RunningTotalsProcessor
      extends StatefulProcessor[Long, (Long, Long, Double), UserState] {
    @transient private var state: ValueState[UserState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserState]("userTotals",
        org.apache.spark.sql.Encoders.product[UserState], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Double)],
                                 timers: TimerValues): Iterator[UserState] = {
      val prev =
        if (state.exists()) state.get()
        else UserState(key, 0L, 0.0, Long.MinValue)
      var n = prev.n_events
      var tot = prev.total_value
      var last = prev.last_ts_us
      rows.foreach { case (_, tsUs, v) =>
        n += 1; tot += v; if (tsUs > last) last = tsUs
      }
      val next = UserState(key, n, tot, last)
      state.update(next)
      Iterator.single(next)
    }
  }

  /** [[runningUserTotals]] on the Spark 4 arbitrary-state API
    * (`transformWithState` + `StatefulProcessor`): same per-user running
    * snapshot, but state lives in named, typed, TTL-capable stores
    * (RocksDB state store provider required) instead of a single opaque
    * `GroupState` value — the API tier that adds per-state TTL, timers,
    * and multiple named states per key. The spec asserts output parity
    * with the v1 twin across identical micro-batch sequences. */
  def runningUserTotalsV2(events: Dataset[(Long, Long, Double)]): Dataset[UserState] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Streaming exact dedup — the streaming twin of
    * [[graft.ops.Dedup.exactKeepFirst]]: the first record per key wins,
    * later duplicates are dropped across micro-batches.
    * `dropDuplicatesWithinWatermark` bounds the per-key state by the
    * watermark horizon (a key's dedup entry is evicted once the watermark
    * passes it), which is what makes exact dedup viable on an unbounded
    * stream: state scales with keys-per-horizon, not stream length.
    * Duplicates arriving later than the horizon are the same accepted
    * loss class as any watermark's late-data drop. */
  def dedupedEvents(events: DataFrame,
                    keyCols: Seq[String],
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** A closed (gap-terminated) session. */
  final case class SessionClose(user_id: Long, start_us: Long, end_us: Long,
                                n_ev: Long)

  /** Session-close events via `flatMapGroupsWithState` — the variable-
    * cardinality state API: zero or many records per (key, micro-batch).
    * A session closes when a later event arrives more than `gapUs` after
    * it; the still-open session stays in state across batches (in
    * production an `EventTimeTimeout` would flush it when the watermark
    * passes; here closure-by-successor keeps the spec deterministic).
    *
    * Cross-batch disorder policy: an event within `gapUs` of the open
    * session's interval (on either side) merges and may extend the START
    * as well as the end; an event more than `gapUs` BEFORE the open
    * session is too late to merge with anything still in state and is
    * emitted immediately as its own single-event closed session (the
    * emit-rather-than-drop analog of a watermark's late-data cutoff).
    * Input: (user_id, ts_us) pairs. */
  def sessionCloseEvents(events: Dataset[(Long, Long)],
                         gapUs: Long = 1800000000L): Dataset[SessionClose] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), SessionClose](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[(Long, Long, Long)]) =>
          // state = (session start, last event, event count)
          var cur = state.getOption
          var closes = List.empty[SessionClose]
          rows.map(_._2).toSeq.sorted.foreach { t =>
            cur match {
              case Some((s, l, n)) if t >= s - gapUs && t <= l + gapUs =>
                cur = Some((math.min(s, t), math.max(l, t), n + 1))
              case Some((s, _, _)) if t < s - gapUs =>
                closes = SessionClose(userId, t, t, 1L) :: closes
              case Some((s, l, n)) => // t > l + gapUs
                closes = SessionClose(userId, s, l, n) :: closes
                cur = Some((t, t, 1L))
              case None =>
                cur = Some((t, t, 1L))
            }
          }
          cur.foreach(state.update)
          closes.reverseIterator
      }
  }

  /** Open-session snapshot for [[SessionTimerProcessor]]. */
  final case class OpenSession(start_us: Long, end_us: Long, n_ev: Long)

  /** Event-time-timer processor behind [[sessionCloseEventsV2]]: the
    * watermark-driven flush [[sessionCloseEvents]] deliberately omits
    * (its sessions close only when a successor arrives; a user who never
    * returns leaks an open session). Each batch (re)registers a timer at
    * session_end + gap; when the WATERMARK passes that point the runtime
    * calls [[handleExpiredTimer]] and the session closes with no
    * successor needed. Stale timers (from a since-extended session) fire
    * with an expiry below the current end+gap and are ignored by the
    * guard rather than individually deleted — the bookkeeping-free form.
    * Same in-batch merge/too-late semantics as the v1 twin. */
  final class SessionTimerProcessor(gapUs: Long)
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp), SessionClose] {
    @transient private var open: ValueState[OpenSession] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession]("openSession",
        org.apache.spark.sql.Encoders.product[OpenSession], TTLConfig.NONE)
    private def timerMsFor(o: OpenSession): Long = (o.end_us + gapUs) / 1000L
    override def handleInputRows(key: Long, rows: Iterator[(Long, java.sql.Timestamp)],
                                 timers: TimerValues): Iterator[SessionClose] = {
      var cur = if (open.exists()) Some(open.get()) else None
      var closes = List.empty[SessionClose]
      rows.map(r => r._2.getTime * 1000L).toSeq.sorted.foreach { t =>
        cur match {
          case Some(o) if t >= o.start_us - gapUs && t <= o.end_us + gapUs =>
            cur = Some(OpenSession(math.min(o.start_us, t), math.max(o.end_us, t), o.n_ev + 1))
          case Some(o) if t < o.start_us - gapUs =>
            closes = SessionClose(key, t, t, 1L) :: closes
          case Some(o) => // t > end + gap: close and roll over
            closes = SessionClose(key, o.start_us, o.end_us, o.n_ev) :: closes
            cur = Some(OpenSession(t, t, 1L))
          case None =>
            cur = Some(OpenSession(t, t, 1L))
        }
      }
      cur.foreach { o =>
        open.update(o)
        getHandle.registerTimer(timerMsFor(o))
      }
      closes.reverseIterator
    }
    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[SessionClose] = {
      if (open.exists()) {
        val o = open.get()
        // a stale timer (session extended since it was set) expires BEFORE
        // the current end+gap — ignore it; only the live timer closes
        if (expired.getExpiryTimeInMs >= timerMsFor(o)) {
          open.clear()
          return Iterator.single(SessionClose(key, o.start_us, o.end_us, o.n_ev))
        }
      }
      Iterator.empty
    }
  }

  /** Per-user activity snapshot emitted each micro-batch. */
  final case class ActivitySnapshot(user_id: Long, n_types: Long,
                                    total: Long, recent_kept: Long)

  /** Multi-state processor behind [[userActivity]] — the remaining two
    * v2 state types in one keyed processor: a `MapState[String, Long]`
    * accumulates per-event-type counts (point lookups and single-key
    * updates — a ValueState holding the whole map would rewrite it per
    * event), and a `ListState[Long]` keeps the last `keepRecent` event
    * timestamps as a capped ring (append per event; trimmed by a full
    * rewrite only when over cap). State size per user: |event types| map
    * entries + `keepRecent` longs, both bounded. */
  final class ActivityProcessor(keepRecent: Int)
      extends StatefulProcessor[Long, (Long, String, Long), ActivitySnapshot] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var recent: ListState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("typeCounts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      recent = getHandle.getListState[Long]("recentTs",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[(Long, String, Long)],
                                 timers: TimerValues): Iterator[ActivitySnapshot] = {
      rows.foreach { case (_, typ, tsUs) =>
        val prev = if (counts.containsKey(typ)) counts.getValue(typ) else 0L
        counts.updateValue(typ, prev + 1L)
        recent.appendValue(tsUs)
      }
      val kept = recent.get().toArray
      val trimmed =
        if (kept.length > keepRecent) {
          val tail = kept.takeRight(keepRecent)
          recent.put(tail) // single rewrite, only when over cap
          tail
        } else kept
      var types = 0L; var total = 0L
      counts.iterator().foreach { case (_, n) => types += 1; total += n }
      Iterator.single(ActivitySnapshot(key, types, total, trimmed.length.toLong))
    }
  }

  /** Per-user running activity summary over (user_id, event_type, ts_us)
    * rows: event-type histogram in MapState, last-N timestamps in
    * ListState — with [[runningUserTotalsV2]] (ValueState) and
    * [[sessionCloseEventsV2]] (timers) this covers every state primitive
    * of the Spark 4 arbitrary-state API. RocksDB provider required. */
  def userActivity(events: Dataset[(Long, String, Long)],
                   keepRecent: Int = 5): Dataset[ActivitySnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(new ActivityProcessor(keepRecent),
        TimeMode.None(), OutputMode.Update())
  }

  /** Session closes with WATERMARK-driven flush — the state API v2 form
    * of [[sessionCloseEvents]] using event-time timers: a session closes
    * either when a successor arrives past the gap (same as v1) or when
    * the watermark passes session_end + gap (the flush v1 cannot do).
    * Input: (user_id, ts) with the watermark already set on `ts` by the
    * caller. RocksDB state store provider required. */
  def sessionCloseEventsV2(events: Dataset[(Long, java.sql.Timestamp)],
                           gapUs: Long = 1800000000L): Dataset[SessionClose] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(new SessionTimerProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
