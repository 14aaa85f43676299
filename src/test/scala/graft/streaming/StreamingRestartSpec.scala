package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.streaming.Analytics.{AttrObs, ClosedVersion, StageHit, UserEvent}
import graft.streaming.Curation.{LineIn, LineKeep, QuotaAdmit, QuotaDoc}

/** Checkpoint-restart parity for the round-9 v2 state processors
  * ([[Analytics.FunnelProcessor]], [[Analytics.Scd2Processor]],
  * [[Curation.QuotaCapProcessor]], [[Curation.LineDedupProcessor]]):
  * each test KILLS the query between micro-batches and restarts a fresh
  * incarnation from the same RocksDB checkpoint, asserting the union of
  * emissions equals an unbroken run over the same data — i.e. the keyed
  * state (chained funnel minima, open SCD2 interval, admission counter,
  * line membership) survives recovery and nothing is re-emitted.
  *
  * Harness: JSON file source → processor → parquet file sink with
  * `Trigger.AvailableNow()` — the same recovery-capable source/sink pair
  * `StreamingSpec`'s exactly-once test pins (memory sinks cannot recover
  * from a checkpoint, so they can't exercise this path). Each batch is
  * written to the source dir before its incarnation runs; inputs are fed
  * in event-time order so the restarted and unbroken runs see the same
  * causal order and the processors' in-batch replay sorts make both
  * deterministic.
  */
class StreamingRestartSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** Feed `batches` through `xform` as N kill-and-restart incarnations
    * sharing one checkpoint, and once as a single unbroken incarnation;
    * return (restarted emissions, unbroken emissions). */
  private def restartedVsUnbroken[I <: Product : Encoder, O](
      batches: Seq[Seq[I]], schema: String,
      xform: Dataset[I] => Dataset[_])(read: org.apache.spark.sql.Row => O): (Seq[O], Seq[O]) = {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def runChain(feeds: Seq[Seq[I]]): Seq[O] = {
        val src = java.nio.file.Files.createTempDirectory("graft-rs-src").toString
        val out = java.nio.file.Files.createTempDirectory("graft-rs-out").toString + "/data"
        val ckpt = java.nio.file.Files.createTempDirectory("graft-rs-ckpt").toString
        feeds.foreach { b =>
          b.toDF().coalesce(1).write.mode("append").json(src)
          val q = xform(spark.readStream.schema(schema).json(src).as[I])
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow()).start()
          // assert on the boolean: a timed-out incarnation stopped
          // mid-batch would otherwise surface as a confusing parity
          // failure instead of a clear timeout
          val done = q.awaitTermination(60000)
          q.stop()
          assert(done, "AvailableNow incarnation did not finish within 60 s")
        }
        spark.read.parquet(out).collect().toSeq.map(read)
      }
      (runChain(batches), runChain(Seq(batches.flatten)))
    } finally prevProvider match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("funnel processor: chained stage minima survive a checkpoint restart") {
    import spark.implicits._
    // user 1 views before the kill, clicks+purchases after: stages 2 and 3
    // can only chain if FunnelTimes was recovered. user 2's full funnel sits
    // in batch 1; user 3 clicks without a view (must never emit).
    val b1 = Seq(
      UserEvent(1L, "view", 1000L, 1L),
      UserEvent(2L, "view", 1100L, 2L), UserEvent(2L, "click", 1200L, 3L),
      UserEvent(2L, "purchase", 1300L, 4L),
      UserEvent(3L, "click", 1400L, 5L))
    val b2 = Seq(
      UserEvent(1L, "click", 2000L, 6L), UserEvent(1L, "purchase", 2100L, 7L),
      UserEvent(3L, "click", 2200L, 8L))
    val schema = "user_id LONG, event_type STRING, ts_micros LONG, event_id LONG"
    val (restarted, unbroken) = restartedVsUnbroken(Seq(b1, b2), schema,
      (ds: Dataset[UserEvent]) => Analytics.funnelStream(ds, "view", "click", "purchase"))(
      r => StageHit(r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(restarted.toSet == unbroken.toSet)
    assert(restarted.length == unbroken.length, "restart re-emitted a stage hit")
    assert(restarted.toSet == Set(
      StageHit(1L, 1, 1000L), StageHit(1L, 2, 2000L), StageHit(1L, 3, 2100L),
      StageHit(2L, 1, 1100L), StageHit(2L, 2, 1200L), StageHit(2L, 3, 1300L)))
  }

  test("SCD2 processor: the open interval survives a checkpoint restart") {
    import spark.implicits._
    // user 1 opens attr "a" before the kill; the post-restart "b" closes it
    // with from_ms recorded pre-kill — only possible if OpenAttr recovered.
    // The version-3 close proves the version counter also carried.
    val b1 = Seq(AttrObs(1L, "a", 1000L, 1L, 1L),
      AttrObs(2L, "x", 1500L, 1L, 2L))
    val b2 = Seq(AttrObs(1L, "b", 2000L, 2L, 3L),
      AttrObs(1L, "c", 3000L, 3L, 4L),
      AttrObs(2L, "x", 2500L, 2L, 5L)) // same attr: absorbed, no close
    val schema = "user_id LONG, attr STRING, ts_micros LONG, ts_ms LONG, event_id LONG"
    val (restarted, unbroken) = restartedVsUnbroken(Seq(b1, b2), schema,
      (ds: Dataset[AttrObs]) => Analytics.scd2Stream(ds))(
      r => ClosedVersion(r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(restarted.toSet == unbroken.toSet)
    assert(restarted.length == unbroken.length, "restart re-emitted a closed version")
    assert(restarted.toSet == Set(
      ClosedVersion(1L, 1L, "a", 1L, 2L), ClosedVersion(1L, 2L, "b", 2L, 3L)))
  }

  test("quota processor: the admission counter survives a checkpoint restart") {
    import spark.implicits._
    // cell "x" saturates (k=2) before the kill — post-restart arrivals must
    // be dropped; cell "y" admits one on each side of the kill and the
    // second admission's rank 2 proves the counter recovered, not reset.
    val b1 = Seq(QuotaDoc("x", 1L, 10L), QuotaDoc("x", 2L, 20L),
      QuotaDoc("y", 5L, 10L))
    // batch-2 priorities all sort after batch-1's — the processor's
    // documented slicing-invariance precondition, so the unbroken run
    // elects the same admissions
    val b2 = Seq(QuotaDoc("x", 3L, 30L), QuotaDoc("y", 6L, 20L))
    val schema = "cell STRING, doc_id LONG, pri LONG"
    val (restarted, unbroken) = restartedVsUnbroken(Seq(b1, b2), schema,
      (ds: Dataset[QuotaDoc]) => Curation.quotaCapStream(ds, k = 2))(
      r => QuotaAdmit(r.getString(0), r.getLong(1), r.getLong(2)))
    assert(restarted.toSet == unbroken.toSet)
    assert(restarted.length == unbroken.length, "restart re-admitted into a full cell")
    assert(restarted.toSet == Set(
      QuotaAdmit("x", 1L, 1L), QuotaAdmit("x", 2L, 2L),
      QuotaAdmit("y", 5L, 1L), QuotaAdmit("y", 6L, 2L)))
  }

  test("watermarked tumbling aggregation (append mode): window state and the " +
       "watermark survive a checkpoint restart") {
    import spark.implicits._
    // hour-1 events arrive pre-kill (window still open at the kill: the
    // watermark has not passed it); hour-3 events post-restart push the
    // recovered watermark past hour 1, so its finalized counts can only
    // be correct if the PARTIAL window state (2 clicks, 1 view) survived
    // the restart. A reset store would emit hour 1 with only whatever
    // batch 2 contained — nothing.
    def ev(id: Long, epochS: Long, tpe: String, v: Double) =
      Ev(id, new java.sql.Timestamp(epochS * 1000L), 1L, tpe, v)
    val h = 3600L
    val b1 = Seq(ev(1, 10 * h + 60, "click", 1.0), ev(2, 10 * h + 120, "click", 2.0),
      ev(3, 10 * h + 180, "view", 5.0))
    val b2 = Seq(ev(4, 12 * h + 60, "click", 7.0), ev(5, 13 * h + 600, "view", 1.0))
    val schema = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
    val (restarted, unbroken) = restartedVsUnbroken(Seq(b1, b2), schema,
      (ds: org.apache.spark.sql.Dataset[Ev]) => {
        import org.apache.spark.sql.Dataset
        val out: Dataset[org.apache.spark.sql.Row] = Events.tumblingCounts(ds.toDF())
        out
      })(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(restarted.toSet == unbroken.toSet)
    assert(restarted.length == unbroken.length, "restart re-finalized a window")
    // hour-10 window finalized with BOTH pre-kill batches' rows
    assert(restarted.toSet.contains((10 * h, "click", 2L, 3.0)))
    assert(restarted.toSet.contains((10 * h, "view", 1L, 5.0)))
  }

  test("four-stage chained pipeline: all four state stores recover under " +
       "ONE checkpoint across a kill-and-restart") {
    import spark.implicits._
    import graft.streaming.Curation.{PageLine, QuotaAdmit}
    // Each stage's recovery is isolated by one post-restart page:
    //  - stage 1 (line membership): doc 12's lines were all kept pre-kill
    //    by doc 10, so post-restart they must ALL drop → doc 12 rebuilds
    //    to "" (then passes dedup as the novel empty doc, and lang a's
    //    quota drops it).
    //  - stage 2 (reassembly frontier): doc 17's two lines straddle the
    //    kill — it can only complete by recovering the in-flight DocAsm
    //    (n_seen=1 + the kept first line) from the checkpoint.
    //  - stage 3 (content membership): doc 15 is a single NOVEL line that
    //    happens to equal doc 14's rebuilt two-line text (embedded \n),
    //    so it survives line dedup, rebuilds to a duplicate, and only the
    //    recovered content-key state can drop it — lang b's quota still
    //    has room, so a reset stage 3 would have admitted it as rk 2.
    //  - stage 4 (admission counters): doc 13 is novel content but lang
    //    a admitted 2 docs pre-kill — only the recovered counter drops
    //    it; doc 16 then lands rk 2 in lang b, proving b's counter
    //    resumed from 1, not 0.
    def page(id: Long, lang: String, lines: Seq[String]): Seq[PageLine] =
      lines.zipWithIndex.map { case (l, p) => PageLine(l, id, p, lang, lines.length) }
    val b1 = page(10L, "a", Seq("boiler", "content ten")) ++
      page(11L, "a", Seq("content eleven")) ++
      page(14L, "b", Seq("x one", "x two")) ++
      Seq(PageLine("partial one", 17L, 0, "c", 2)) // doc 17 half 1
    val b2 = page(12L, "a", Seq("boiler", "content ten")) ++
      page(13L, "a", Seq("content thirteen")) ++
      page(15L, "b", Seq("x one\nx two")) ++
      page(16L, "b", Seq("content sixteen")) ++
      Seq(PageLine("partial two", 17L, 1, "c", 2)) // doc 17 half 2
    val schema = "line STRING, doc_id LONG, pos INT, lang STRING, n_lines INT"
    val (restarted, unbroken) = restartedVsUnbroken(Seq(b1, b2), schema,
      (ds: org.apache.spark.sql.Dataset[PageLine]) =>
        Curation.curationPipelineStream(ds, quotaK = 2))(
      r => QuotaAdmit(r.getString(0), r.getLong(1), r.getLong(2)))
    assert(restarted.toSet == unbroken.toSet)
    assert(restarted.length == unbroken.length, "restart re-admitted through the chain")
    assert(restarted.toSet == Set(
      QuotaAdmit("a", 10L, 1L), QuotaAdmit("a", 11L, 2L),
      QuotaAdmit("b", 14L, 1L), QuotaAdmit("b", 16L, 2L),
      QuotaAdmit("c", 17L, 1L)))
  }

  test("line-dedup processor: line membership survives a checkpoint restart") {
    import spark.implicits._
    // "chrome" is kept pre-kill and re-arrives post-restart (must drop);
    // "fresh" first appears post-restart (must keep).
    val b1 = Seq(LineIn("chrome", 1L, 0), LineIn("body one", 1L, 1))
    val b2 = Seq(LineIn("chrome", 2L, 0), LineIn("fresh", 2L, 1))
    val schema = "line STRING, doc_id LONG, pos INT"
    val (restarted, unbroken) = restartedVsUnbroken(Seq(b1, b2), schema,
      (ds: Dataset[LineIn]) => Curation.lineDedupStream(ds))(
      r => LineKeep(r.getLong(0), r.getInt(1), r.getString(2)))
    assert(restarted.toSet == unbroken.toSet)
    assert(restarted.length == unbroken.length, "restart re-kept a seen line")
    assert(restarted.toSet == Set(
      LineKeep(1L, 0, "chrome"), LineKeep(1L, 1, "body one"),
      LineKeep(2L, 1, "fresh")))
  }
}
