package graft.streaming

import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.TTLConfig
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.streaming.Curation.PageLine

/** State-size audit under sustained load (round-10 verdict item 5).
  *
  * Restart parity and batch parity prove the four-stage curation chain
  * is CORRECT; what they don't measure is state GROWTH. This spec runs
  * the chained pipeline (the `StreamingPipelineSpec` shape) over a much
  * longer synthetic stream — 6000 pages across 12 micro-batches, 50×
  * the pipeline spec's 120 — and reads the per-operator
  * `StateOperatorProgress.numRowsTotal` after every batch, asserting
  * the documented bound for each processor:
  *
  *  - DocReassembleProcessor: state == the in-flight frontier. Batches
  *    are page-aligned, so it must return to ZERO rows after every
  *    batch — at scale the store holds the ingestion frontier, not the
  *    corpus (`Curation.scala` DocReassembleProcessor scaladoc).
  *  - LineVerdictProcessor: state == one row per DISTINCT line ever
  *    seen — the dedup ledger. Grows, but with the duplicate-heavy
  *    distribution it stays well under total line occurrences (the
  *    quantified "grows with distinct lines" claim).
  *  - IncrementalDedupProcessor: one row per distinct content key.
  *  - QuotaCapProcessor: one row per quota cell (|langs|).
  *
  * The TTL arm proves the ledger is FORGETTABLE: with a short
  * `TTLConfig`, a line replayed after expiry is re-admitted (state was
  * dropped), which is what bounds the line ledger to the retention
  * horizon in a production deployment. RocksDB removes expired rows
  * lazily, so the TTL arm asserts the SEMANTIC evidence (re-admission)
  * and records the measured row counts rather than asserting on the
  * store's internal cleanup schedule.
  */
class StreamingStateSizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** Synthetic page corpus with a realistic duplicate-heavy line mix:
    * every page opens/closes with boilerplate drawn from a small shared
    * pool (the cross-doc duplicate mass) around unique body lines. */
  private def syntheticPages(nDocs: Int): Seq[(Long, String, Seq[String])] = {
    val langs = Array("en", "de", "fr", "zh")
    val chrome = (0 until 40).map(i => s"boilerplate chrome line $i")
    (0L until nDocs.toLong).map { id =>
      val lang = langs((id % langs.length).toInt)
      // five boilerplate lines per page from a small shared pool: the
      // cross-doc duplicate mass outweighs the unique body (2–4 lines),
      // as on real web corpora
      val header = Seq(chrome((id % 7L).toInt), chrome(7 + (id % 5L).toInt))
      val footer = Seq(chrome(20 + (id % 5L).toInt), chrome(25 + (id % 4L).toInt),
        chrome(30 + (id % 3L).toInt))
      val body = (0 until 2 + (id % 3L).toInt).map(j => s"unique body $id line $j")
      (id, lang, header ++ body ++ footer)
    }
  }

  private def toLines(docs: Seq[(Long, String, Seq[String])]): Seq[PageLine] =
    docs.flatMap { case (id, lang, ls) =>
      ls.zipWithIndex.map { case (l, p) => PageLine(l, id, p, lang, ls.length) }
    }

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Run the 4-stage chain over `batches`, returning (admitted rows,
    * per-batch state-row counts per operator, per-batch memory bytes). */
  private def runChain(batches: Seq[Seq[PageLine]], ttl: TTLConfig,
                       sleepAfterBatch: Option[(Int, Long)] = None)
      : (Seq[(String, Long, Long)], Seq[Seq[Long]], Seq[Seq[Long]]) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PageLine]
    val name = s"state_audit_${System.nanoTime()}"
    val q = Curation.curationPipelineStream(mem.toDS(), quotaK = 2000, ttl)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val rowsPerBatch = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val memPerBatch = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    batches.zipWithIndex.foreach { case (b, i) =>
      mem.addData(b: _*)
      q.processAllAvailable()
      val ops = q.lastProgress.stateOperators
      rowsPerBatch += ops.map(_.numRowsTotal).toSeq
      memPerBatch += ops.map(_.memoryUsedBytes).toSeq
      sleepAfterBatch.foreach { case (at, ms) => if (i == at) Thread.sleep(ms) }
    }
    q.stop()
    val admitted = spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    (admitted, rowsPerBatch.toSeq, memPerBatch.toSeq)
  }

  test("state stays bounded by ledger+frontier over a 50x stream: " +
       "reassembler returns to zero every batch, line state == distinct lines, " +
       "dedup state == content keys, quota state == |langs|") {
    withRocksDb {
      val docs = syntheticPages(6000)
      val batches = docs.grouped(500).map(toLines).toSeq
      val totalLineOccurrences = docs.map(_._3.length).sum
      val distinctLines = docs.flatMap(_._3).distinct.size
      // quotaK above the per-lang doc count: this test audits state size,
      // not gating (every novel doc flows through all four stages)
      val (admitted, rows, mem) = runChain(batches, TTLConfig.NONE)

      // content keys: replay the line-dedup → rebuild → md5 chain locally
      val seenLine = scala.collection.mutable.Set.empty[String]
      val keys = scala.collection.mutable.Set.empty[String]
      docs.foreach { case (_, lang, ls) =>
        val kept = ls.filter(seenLine.add)
        keys += java.security.MessageDigest.getInstance("MD5")
          .digest(kept.mkString("\n").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString + ":" + lang
      }
      val nLangs = docs.map(_._2).distinct.size

      val finalRows = rows.last.sorted
      val expected = Seq(0L, distinctLines.toLong, keys.size.toLong, nLangs.toLong).sorted
      assert(finalRows == expected,
        s"final state rows $finalRows != expected (frontier=0, lines=$distinctLines, " +
          s"keys=${keys.size}, langs=$nLangs)")
      // the frontier operator (the unique all-zero column) is zero after
      // EVERY page-aligned batch, not just the last one
      val zeroCol = rows.head.indices.filter(i => rows.forall(_(i) == 0L))
      assert(zeroCol.nonEmpty,
        s"no operator stayed at frontier-zero across batches: $rows")
      // the ledger is the dedup ledger, not the stream: distinct lines
      // must stay well under total occurrences on this duplicate-heavy mix
      assert(distinctLines.toLong * 2 < totalLineOccurrences,
        s"fixture lost its duplicate mass ($distinctLines vs $totalLineOccurrences)")
      assert(rows.last.max == distinctLines.toLong)
      // sustained load really flowed (quota high enough not to gate here)
      assert(admitted.size == keys.size)
      // committed record of the measurement (the audit's deliverable):
      // per-batch state rows and store bytes for the four operators
      info(s"line occurrences fed: $totalLineOccurrences over ${batches.size} batches")
      info(s"state rows per batch (4 ops): ${rows.map(_.mkString("[", ",", "]")).mkString(" ")}")
      info(s"state bytes final: ${mem.last.mkString("[", ",", "]")}")
    }
  }

  test("chain with a real (long-horizon) TTL: mixed time modes in one query " +
       "— three ProcessingTime stages + the NoTime reassembler — admit the " +
       "same set as the TTL-NONE chain") {
    withRocksDb {
      // timeModeFor gives the ttl-threading stages ProcessingTime while
      // DocReassembleProcessor stays NoTime; this pins that Spark accepts
      // the mixed-mode plan AND that a horizon no batch outlives changes
      // nothing semantically. ProcessingTime-mode queries spin
      // clock-advance batches, so this uses the progress-poll harness
      // (see the TTL arm below), not processAllAvailable.
      import org.apache.spark.sql.streaming.Trigger
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val docs = syntheticPages(300)
      val batches = docs.grouped(150).map(toLines).toSeq
      def run(ttl: TTLConfig): Set[(String, Long, Long)] = {
        val mem = MemoryStream[PageLine]
        val name = s"mixed_mode_${System.nanoTime()}"
        val q = Curation.curationPipelineStream(mem.toDS(), quotaK = 2000, ttl)
          .writeStream.format("memory").queryName(name).outputMode("append")
          .trigger(Trigger.ProcessingTime(250)).start()
        var fed = 0
        batches.foreach { b =>
          mem.addData(b: _*)
          fed += b.length
          val deadline = System.currentTimeMillis + 60000
          def seen: Long = q.recentProgress.map(_.numInputRows).sum
          while (seen < fed && System.currentTimeMillis < deadline) Thread.sleep(100)
          assert(seen >= fed, s"chain did not commit $fed rows in 60 s")
        }
        q.stop()
        spark.table(name).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      }
      val baseline = run(TTLConfig.NONE)
      val ttld = run(TTLConfig(Duration.ofMinutes(10)))
      assert(baseline.nonEmpty && ttld == baseline,
        s"mixed-mode chain diverged: extra=${ttld diff baseline} missing=${baseline diff ttld}")
    }
  }

  test("TTL arm: an expired line is forgotten and its next occurrence " +
       "re-admitted — the ledger is bounded by the retention horizon") {
    withRocksDb {
      // Direct processor-level check (the chain threads `ttl` through all
      // four stages, which cascades expiry effects; the crisp forgetting
      // semantics are the LINE ledger's): incarnation 0 seeds line L;
      // after the TTL horizon passes, incarnation 1 replays L from
      // another doc. Without TTL the replay is dropped (keep-first,
      // forever); with TTL the state row expired, so the replay is
      // RE-ADMITTED — the property that bounds the ledger to the
      // retention horizon at 100 TB. AvailableNow incarnations (the
      // StreamingRestartSpec harness) rather than a long-running query:
      // a ProcessingTime-mode query runs continuous empty micro-batches
      // between data arrivals, which a spec should not sit inside; TTL
      // expiry is wall-clock, so it fires across incarnations just as it
      // would across triggers. The incarnation/polling mechanics live in
      // the shared TtlIncarnations harness.
      import spark.implicits._
      def run(ttl: TTLConfig): Seq[Long] = {
        // 1600 ms between incarnations > the 800 ms TTL horizon
        val out = TtlIncarnations.feed(spark,
          Seq(Seq(Curation.LineIn("shared line", 0L, 0)),
            Seq(Curation.LineIn("shared line", 1L, 0))),
          waitBetweenMs = 1600,
          (lines: org.apache.spark.sql.Dataset[Curation.LineIn]) =>
            Curation.lineDedupStream(lines, ttl))
        spark.read.parquet(out).collect().map(_.getLong(0)).toSeq.sorted
      }
      val noTtl = run(TTLConfig.NONE)
      assert(noTtl == Seq(0L), s"without TTL the replay must stay dropped: $noTtl")
      val withTtl = run(TTLConfig(Duration.ofMillis(800)))
      assert(withTtl == Seq(0L, 1L),
        s"with TTL the expired line must be re-admitted: $withTtl")
    }
  }
}
