package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming ANALYTICS arm: the continuous form of the q148 ordered
  * funnel. The batch query scans the whole event table and takes chained
  * stage minima; the streaming form keeps each user's stage-completion
  * times as KEYED STATE and emits a stage-completion record the moment a
  * user first crosses a stage — the live conversion dashboard feed,
  * exact forever without re-scanning history.
  *
  * Scale shape: state is one fixed-size record (3 longs) per ACTIVE
  * user, sharded by user across the RocksDB store — horizontal scale
  * with shuffle partitions, no driver-held aggregate; a production
  * deployment bounds retention with a `TTLConfig` horizon (inactive
  * users expire; the stage counts already emitted are downstream).
  * The per-stage counts the batch query reports are a stateless
  * downstream aggregation of the emitted completion records.
  */
object Analytics {

  /** One event arriving at the funnel, timestamp in exact microseconds
    * (the batch query's comparison precision). */
  final case class UserEvent(user_id: Long, event_type: String,
                             ts_micros: Long, event_id: Long)

  /** Stage-completion record: user `user_id` first completed funnel
    * stage `stage` (1-based) at `ts_micros`. Emitted at most once per
    * (user, stage). */
  final case class StageHit(user_id: Long, stage: Int, ts_micros: Long)

  /** Per-user chained stage times; -1 = not reached. Fixed 3-stage shape
    * mirrors declared q148 (view → click → purchase). */
  final case class FunnelTimes(t1: Long, t2: Long, t3: Long)

  /** Keyed funnel processor. Within a micro-batch the user's slice is
    * replayed in (ts_micros, event_id) order — q148's total order — so a
    * stream fed in event-time order (one batch, or any batching that
    * respects it) reaches EXACTLY the batch query's chained stage minima
    * (parity-spec'd under multi-batch slicing). Across out-of-order
    * batches arrival wins: an earlier-timestamped view arriving after a
    * click was already admitted cannot retroactively re-chain — the only
    * causal option a continuous gate has (the [[Curation]] processors'
    * contract). */
  final class FunnelProcessor(s1: String, s2: String, s3: String)
      extends StatefulProcessor[Long, UserEvent, StageHit] {
    @transient private var times: ValueState[FunnelTimes] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      times = getHandle.getValueState[FunnelTimes]("funnelTimes",
        Encoders.product[FunnelTimes], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
                                 timers: TimerValues): Iterator[StageHit] = {
      val before = if (times.exists()) times.get() else FunnelTimes(-1L, -1L, -1L)
      var st = before
      val out = scala.collection.mutable.ArrayBuffer.empty[StageHit]
      // replay this key's slice in the batch query's total order
      rows.toArray.sortBy(e => (e.ts_micros, e.event_id)).foreach { e =>
        if (st.t1 < 0 && e.event_type == s1) {
          st = st.copy(t1 = e.ts_micros); out += StageHit(key, 1, e.ts_micros)
        } else if (st.t1 >= 0 && st.t2 < 0 && e.event_type == s2 &&
                   e.ts_micros > st.t1) {
          st = st.copy(t2 = e.ts_micros); out += StageHit(key, 2, e.ts_micros)
        } else if (st.t2 >= 0 && st.t3 < 0 && e.event_type == s3 &&
                   e.ts_micros > st.t2) {
          st = st.copy(t3 = e.ts_micros); out += StageHit(key, 3, e.ts_micros)
        }
      }
      // skip the store write when the batch changed nothing for this key
      if (st != before) times.update(st)
      out.iterator
    }
  }

  /** Run the ordered funnel over an event stream — the continuous form
    * of q148. Requires the RocksDB state store provider (state API v2),
    * like the [[Curation]] processors. */
  def funnelStream(events: Dataset[UserEvent],
                   s1: String, s2: String, s3: String): Dataset[StageHit] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(s1, s2, s3),
        TimeMode.None(), OutputMode.Append())
  }

  // ---- continuous SCD2 (the q161 CDC form) ----------------------------------

  /** One attribute observation arriving at the history builder. */
  final case class AttrObs(user_id: Long, attr: String, ts_micros: Long,
                           ts_ms: Long, event_id: Long)

  /** A CLOSED validity interval: user held `attr` from `from_ms` until
    * `to_ms` (exclusive), as version `version`. The currently-open
    * interval lives in state — an append-mode stream cannot retract, so
    * open rows are never emitted (they would need a correction once
    * closed); batch q161's non-NULL-to_ms rows are exactly this
    * stream's output under in-order feeding (parity-spec'd). */
  final case class ClosedVersion(user_id: Long, version: Long, attr: String,
                                 from_ms: Long, to_ms: Long)

  /** Per-user open-interval state for [[Scd2Processor]]. `from_micros`
    * carries the exact opening event time for the staleness guard. */
  final case class OpenAttr(version: Long, attr: String, from_ms: Long,
                            from_micros: Long)

  /** Keyed SCD2 processor — the change-data-capture twin of the q161
    * batch rebuild: one open interval per user in state; an observation
    * with a DIFFERENT attribute closes it (emitting the closed version)
    * and opens the next. Micro-batch slices replay in (ts_micros,
    * event_id) order — q161's total order — so in-order feeding emits
    * exactly the batch history's closed rows; across out-of-order
    * batches arrival wins (the [[FunnelProcessor]] causal contract). */
  final class Scd2Processor
      extends StatefulProcessor[Long, AttrObs, ClosedVersion] {
    @transient private var open: ValueState[OpenAttr] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenAttr]("openAttr",
        Encoders.product[OpenAttr], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[AttrObs],
                                 timers: TimerValues): Iterator[ClosedVersion] = {
      val before = if (open.exists()) Option(open.get()) else None
      var cur = before
      val out = scala.collection.mutable.ArrayBuffer.empty[ClosedVersion]
      rows.toArray.sortBy(o => (o.ts_micros, o.event_id)).foreach { o =>
        cur match {
          case None =>
            cur = Some(OpenAttr(1L, o.attr, o.ts_ms, o.ts_micros))
          case Some(c) if o.ts_micros < c.from_micros =>
            // stale cross-batch straggler from BEFORE the open interval:
            // admitting it would emit an inverted [from, to) — ignore
            // (arrival wins, like the funnel's already-admitted stages)
            ()
          case Some(c) if c.attr != o.attr =>
            out += ClosedVersion(key, c.version, c.attr, c.from_ms, o.ts_ms)
            cur = Some(OpenAttr(c.version + 1L, o.attr, o.ts_ms, o.ts_micros))
          case _ => () // same attr: the open interval absorbs it
        }
      }
      // skip the store write when the batch changed nothing for this key
      if (cur != before) cur.foreach(open.update)
      out.iterator
    }
  }

  /** Build SCD2 history continuously from an attribute-observation
    * stream — the CDC form of q161 (which rebuilds from the full log).
    * Requires the RocksDB state store provider (state API v2). */
  def scd2Stream(obs: Dataset[AttrObs]): Dataset[ClosedVersion] = {
    import obs.sparkSession.implicits._
    obs
      .groupByKey(_.user_id)
      .transformWithState(new Scd2Processor,
        TimeMode.None(), OutputMode.Append())
  }
}
