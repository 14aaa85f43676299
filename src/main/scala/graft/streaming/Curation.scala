package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming CURATION arm: incremental corpus dedup as a continuous job —
  * the streaming twin of the batch ingestion dedup
  * ([[graft.ops.Dedup.incrementalDedup]], declared q85). The batch op
  * answers "which rows of this batch are new vs a fixed corpus" with a
  * Bloom pre-filter + exact anti-join; the streaming form keeps the
  * corpus membership as KEYED STATE, so each arriving document is admitted
  * or dropped in-flight and the answer stays exact forever without
  * re-scanning the corpus.
  *
  * Scale shape: state is one boolean per distinct key, sharded by the
  * dedup key across the state store (RocksDB) exactly like a shuffle
  * partition — horizontal scale comes free with
  * `spark.sql.shuffle.partitions`, and no single node ever holds the key
  * universe (contrast the batch Bloom filter, which is driver-built and
  * broadcast whole). Production deployments bound retention with a
  * `TTLConfig` horizon the same way `dedupedEvents` bounds its watermark
  * state; parity specs use TTL NONE.
  */
object Curation {

  /** TimeMode matching the TTL request: Spark rejects TTL'd state under
    * `TimeMode.None` ([STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL]),
    * so a real retention horizon needs ProcessingTime — while the parity
    * specs (TTL NONE) keep the time-independent NoTime plan. Every
    * ttl-threading builder below derives its mode from here; the
    * StreamingStateSizeSpec TTL arm exercises the ProcessingTime path. */
  private def timeModeFor(ttl: TTLConfig): TimeMode =
    if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()

  /** One document arriving at the dedup gate. `is_seed` rows BOOTSTRAP
    * state (existing-corpus members: mark the key seen, emit nothing);
    * stream rows are admitted iff their key is unseen. Seeds are fed as
    * the leading micro-batch(es) — the state-bootstrap phase of a
    * deployed dedup stream; a seed sharing a micro-batch with stream
    * rows of the same key still blocks them (corpus-first, order-free). */
  final case class SeedableDoc(key: String, doc_id: Long, lang: String,
                               is_seed: Boolean)

  /** An admitted (novel) document. */
  final case class AdmittedDoc(doc_id: Long, lang: String, key: String)

  /** Keyed membership processor. Top-level class so a checkpoint can
    * re-instantiate it (same contract as
    * [[Events.RunningTotalsProcessor]]).
    *
    * `dedupWithinStream = true`  — keep-first curation: the first stream
    * document per key (min doc_id inside a micro-batch, arrival order
    * across batches) is admitted, every later one dropped — the
    * streaming twin of q22's keyed keep-first.
    * `dedupWithinStream = false` — q85 parity: only corpus seeds block;
    * stream rows never mark state, so the admitted set is exactly the
    * batch op's "all batch rows whose key is not in the corpus"
    * (within-batch duplicates all admitted, like the anti-join). */
  final class IncrementalDedupProcessor(dedupWithinStream: Boolean,
                                        ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, SeedableDoc, AdmittedDoc] {
    @transient private var seen: ValueState[Boolean] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seenKey",
        Encoders.scalaBoolean, ttl)
    override def handleInputRows(key: String, rows: Iterator[SeedableDoc],
                                 timers: TimerValues): Iterator[AdmittedDoc] = {
      // buffer this key's micro-batch slice (tiny: one key's rows) so a
      // same-batch seed blocks stream rows regardless of iterator order
      val buf = rows.toArray
      val blocked = seen.exists() || buf.exists(_.is_seed)
      val streamRows = buf.filter(!_.is_seed)
      val admitted =
        if (blocked || streamRows.isEmpty) Array.empty[SeedableDoc]
        else if (dedupWithinStream) Array(streamRows.minBy(_.doc_id))
        else streamRows
      if (buf.exists(_.is_seed) ||
          (dedupWithinStream && streamRows.nonEmpty)) seen.update(true)
      admitted.iterator.map(d => AdmittedDoc(d.doc_id, d.lang, d.key))
    }
  }

  /** Admit the novel documents of a seeded stream — see
    * [[IncrementalDedupProcessor]] for the two modes. Requires the
    * RocksDB state store provider (state API v2). */
  def incrementalDedupStream(docs: Dataset[SeedableDoc],
                             dedupWithinStream: Boolean = true,
                             ttl: TTLConfig = TTLConfig.NONE): Dataset[AdmittedDoc] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.key)
      .transformWithState(new IncrementalDedupProcessor(dedupWithinStream, ttl),
        timeModeFor(ttl), OutputMode.Append())
  }

  // ---- streaming dataset card ----------------------------------------------

  /** One ingested document's contribution to its source's card. */
  final case class DocStat(source: String, doc_id: Long, ntok: Long)

  /** The running per-source card (the streaming half of q127): volume,
    * token totals and the length envelope, updated per micro-batch. */
  final case class SourceCard(source: String, n_docs: Long, n_tokens: Long,
                              min_tokens: Long, max_tokens: Long)

  /** Keyed running-card processor — the q127 rollup maintained as
    * continuous state, so a curation deployment publishes fresh
    * dataset-card numbers as the corpus ingests instead of re-scanning
    * it. State is ONE fixed-size row per source (card fields only),
    * sharded by source across the store: bounded by |sources| at any
    * corpus size. Counts and sums are exact integers, so the final
    * emitted card per source equals the batch aggregate over the same
    * rows regardless of micro-batch slicing (batch-parity spec'd). */
  final class SourceCardProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, DocStat, SourceCard] {
    @transient private var card: ValueState[SourceCard] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      card = getHandle.getValueState[SourceCard]("card",
        Encoders.product[SourceCard], ttl)
    override def handleInputRows(key: String, rows: Iterator[DocStat],
                                 timers: TimerValues): Iterator[SourceCard] = {
      var c =
        if (card.exists()) card.get()
        else SourceCard(key, 0L, 0L, Long.MaxValue, Long.MinValue)
      rows.foreach { r =>
        c = SourceCard(key, c.n_docs + 1, c.n_tokens + r.ntok,
          math.min(c.min_tokens, r.ntok), math.max(c.max_tokens, r.ntok))
      }
      card.update(c)
      Iterator.single(c)
    }
  }

  /** Maintain running per-source dataset cards over a document stream —
    * emits each source's updated card every micro-batch it appears in
    * (Update mode downstream keeps the latest). */
  def sourceCardStream(docs: Dataset[DocStat],
                       ttl: TTLConfig = TTLConfig.NONE): Dataset[SourceCard] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .transformWithState(new SourceCardProcessor(ttl),
        timeModeFor(ttl), OutputMode.Update())
  }

  // ---- streaming quota cap ---------------------------------------------------

  /** One document arriving at the quota gate: `cell` is the quota key
    * (q138 uses source+lang), `pri` its deterministic hash priority. */
  final case class QuotaDoc(cell: String, doc_id: Long, pri: Long)

  /** An admitted document with its admission rank inside its cell. */
  final case class QuotaAdmit(cell: String, doc_id: Long, rk: Long)

  /** Streaming twin of q138's per-cell quota: admit at most `k` documents
    * per cell, counting admissions in keyed state. Within a micro-batch
    * the slice is ranked by (pri, doc_id) — q138's exact order — so a
    * stream fed as one batch (or any batching that respects priority
    * order) admits EXACTLY the batch query's kept set with equal ranks
    * (parity-spec'd); across micro-batches arrival wins, which is the
    * only causal option a continuous gate has (a later arrival cannot
    * evict an admission already emitted downstream). State per cell is
    * ONE long — bounded by the cell catalog, like the card processor. */
  final class QuotaCapProcessor(k: Int, ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, QuotaDoc, QuotaAdmit] {
    @transient private var admitted: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admitted = getHandle.getValueState[Long]("admitted",
        Encoders.scalaLong, ttl)
    override def handleInputRows(key: String, rows: Iterator[QuotaDoc],
                                 timers: TimerValues): Iterator[QuotaAdmit] = {
      var c = if (admitted.exists()) admitted.get() else 0L
      // saturated-cell fast path: the steady state of a capped cell is
      // "drop everything" — skip the buffer+sort entirely (the
      // LineDedupProcessor skip pattern)
      if (c >= k) return Iterator.empty
      val out = scala.collection.mutable.ArrayBuffer.empty[QuotaAdmit]
      val slice = rows.toArray.sortBy(d => (d.pri, d.doc_id))
      var i = 0
      while (i < slice.length && c < k) {
        c += 1
        out += QuotaAdmit(key, slice(i).doc_id, c)
        i += 1
      }
      admitted.update(c)
      out.iterator
    }
  }

  /** Enforce a per-cell admission quota over a document stream — the
    * continuous form of q138. Requires the RocksDB state store provider
    * (state API v2), like the other processors here. */
  def quotaCapStream(docs: Dataset[QuotaDoc], k: Int,
                     ttl: TTLConfig = TTLConfig.NONE): Dataset[QuotaAdmit] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.cell)
      .transformWithState(new QuotaCapProcessor(k, ttl),
        timeModeFor(ttl), OutputMode.Append())
  }

  // ---- streaming line-level dedup --------------------------------------------

  /** One line of an ingesting page: the content is the state key; (doc_id,
    * pos) is q142's global keep-first order inside a micro-batch. */
  final case class LineIn(line: String, doc_id: Long, pos: Int)

  /** A line that survived the gate — the caller reassembles documents
    * from their surviving (doc_id, pos, line) triples exactly like the
    * batch rewrite's tail. */
  final case class LineKeep(doc_id: Long, pos: Int, line: String)

  /** Streaming twin of q142's line-level corpus dedup: one boolean per
    * DISTINCT LINE in keyed state — the first arrival wins, every later
    * occurrence (boilerplate chrome, repeated spans) is dropped in-flight.
    * Within a micro-batch the winner is the (doc_id, pos)-minimal row,
    * q142's exact election, so a stream whose batching respects doc_id
    * order admits EXACTLY the batch query's kept line set (parity-spec'd
    * under multi-batch slicing); across batches arrival wins — the only
    * causal option, as with [[QuotaCapProcessor]].
    *
    * Scale shape: state shards by LINE CONTENT across the RocksDB store —
    * the hot boilerplate lines that would serialize a batch window are
    * one state row each here, and the store scales with shuffle
    * partitions; production bounds retention with a TTL horizon where
    * the dedup contract allows forgetting cold lines. */
  final class LineDedupProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, LineIn, LineKeep] {
    @transient private var seen: ValueState[Boolean] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seenLine",
        Encoders.scalaBoolean, ttl)
    override def handleInputRows(key: String, rows: Iterator[LineIn],
                                 timers: TimerValues): Iterator[LineKeep] = {
      if (seen.exists()) Iterator.empty
      else {
        val first = rows.minBy(r => (r.doc_id, r.pos))
        seen.update(true)
        Iterator.single(LineKeep(first.doc_id, first.pos, first.line))
      }
    }
  }

  /** Admit each distinct line's first occurrence over a page stream — the
    * continuous form of q142's keeper election. Requires the RocksDB
    * state store provider (state API v2). */
  def lineDedupStream(lines: Dataset[LineIn],
                      ttl: TTLConfig = TTLConfig.NONE): Dataset[LineKeep] = {
    import lines.sparkSession.implicits._
    lines
      .groupByKey(_.line)
      .transformWithState(new LineDedupProcessor(ttl),
        timeModeFor(ttl), OutputMode.Append())
  }

  // ---- composable end-to-end curation pipeline ------------------------------
  //
  // The stages above each gate ONE granularity (line content, content key,
  // quota cell). Composing them into the batch chain line-dedup → corpus
  // dedup → quota (CurationPipelineSpec's shape) inside ONE streaming query
  // needs a bridge the drop-only LineDedupProcessor cannot provide: a
  // downstream doc-granularity stage must know when a document's line set
  // is COMPLETE, but dropped lines simply never arrive. The fix is to make
  // the line gate emit a VERDICT for every line (kept or dropped) and let a
  // doc-keyed reassembler count verdicts against the page's line count —
  // completion becomes data, no watermark or timer needed, and the whole
  // chain runs under one checkpoint/state regime.

  /** One line of a page entering the verdict gate, carrying everything the
    * downstream reassembler needs: its page's language (quota routing) and
    * total line count (completion detection). */
  final case class PageLine(line: String, doc_id: Long, pos: Int,
                            lang: String, n_lines: Int)

  /** A judged line: `kept` iff this occurrence is the line's global first
    * (the q142 election). Every input line yields exactly one verdict. */
  final case class LineVerdict(doc_id: Long, pos: Int, line: String,
                               kept: Boolean, lang: String, n_lines: Int)

  /** [[LineDedupProcessor]]'s election with total emission: within a
    * micro-batch the (doc_id, pos)-minimal occurrence of an unseen line is
    * kept, every other occurrence (same batch or later) is judged dropped.
    * Same one-boolean-per-line state. */
  final class LineVerdictProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, PageLine, LineVerdict] {
    @transient private var seen: ValueState[Boolean] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seenLine",
        Encoders.scalaBoolean, ttl)
    override def handleInputRows(key: String, rows: Iterator[PageLine],
                                 timers: TimerValues): Iterator[LineVerdict] = {
      val buf = rows.toArray
      val winner: Option[(Long, Int)] =
        if (seen.exists()) None
        else { seen.update(true); Some { val w = buf.minBy(r => (r.doc_id, r.pos)); (w.doc_id, w.pos) } }
      buf.iterator.map(r => LineVerdict(r.doc_id, r.pos, r.line,
        kept = winner.contains((r.doc_id, r.pos)), r.lang, r.n_lines))
    }
  }

  /** A page rebuilt from its surviving lines, in original line order. */
  final case class RebuiltDoc(doc_id: Long, lang: String, text: String,
                              n_kept: Int)

  /** Per-doc state for [[DocReassembleProcessor]]: verdicts seen so far
    * and the kept (pos, line) pairs. */
  final case class DocAsm(n_seen: Int, kept_pos: List[Int],
                          kept_line: List[String])

  /** Doc-keyed reassembly: accumulate line verdicts until all `n_lines`
    * of the page have been judged, then emit the rebuilt document (kept
    * lines joined in position order — empty text, not dropped row, when
    * everything was duplicate: q129's contract) and CLEAR the state.
    * State per in-flight doc is bounded by its line count and exists only
    * between a page's first and last verdict — at scale the store holds
    * the ingestion frontier, not the corpus. */
  final class DocReassembleProcessor
      extends StatefulProcessor[Long, LineVerdict, RebuiltDoc] {
    @transient private var asm: ValueState[DocAsm] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      asm = getHandle.getValueState[DocAsm]("docAsm",
        Encoders.product[DocAsm], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[LineVerdict],
                                 timers: TimerValues): Iterator[RebuiltDoc] = {
      val buf = rows.toArray
      val before = if (asm.exists()) asm.get() else DocAsm(0, Nil, Nil)
      val kept = buf.filter(_.kept)
      val st = DocAsm(before.n_seen + buf.length,
        before.kept_pos ++ kept.map(_.pos).toList,
        before.kept_line ++ kept.map(_.line).toList)
      val total = buf.head.n_lines
      if (st.n_seen >= total) {
        asm.clear()
        val ordered = st.kept_pos.zip(st.kept_line).sortBy(_._1).map(_._2)
        Iterator.single(RebuiltDoc(key, buf.head.lang,
          ordered.mkString("\n"), ordered.length))
      } else { asm.update(st); Iterator.empty }
    }
  }

  // ---- streaming NEAR-dup (banded MinHash membership) ------------------------
  //
  // The exact gate above admits a document iff its content KEY is novel;
  // a live ingestion pipeline also dedups FUZZILY (the r11 verdict's one
  // missing streaming twin). This is batch q34's banded-MinHash machinery
  // ([[graft.ops.Dedup.minhashCandidates]]) as keyed state: the stateless
  // front half (shingle → minhash → band fold) runs per arriving document
  // with the SAME kernels the batch path uses, and the batch self-join on
  // (band, bsig) becomes a (band, bsig)-keyed membership processor — each
  // bucket's state is the doc ids seen in it, and a new arrival pairs with
  // every stored member. A second keyed stage emits each (d1, d2) pair
  // once (bands overlap by design: OR-amplification).
  //
  // Scale shape: buckets shard across the RocksDB store exactly like the
  // batch exchange's hash partitions; per-bucket state is capped at
  // `maxBucket` ids (a flooded boilerplate bucket stops ADMITTING members
  // but keeps pairing arrivals against the stored ones — bounded state,
  // candidate loss only among over-cap member pairs, the same mass the
  // batch path's pair explosion guards exist for) and TTL bounds
  // retention to the dedup horizon. Candidates estimate; a deployment
  // verifies exact Jaccard against a doc store downstream, exactly like
  // the batch op verifies its candidate set (parity spec does this and
  // matches q34's output rows).

  /** One document entering the near-dup gate. */
  final case class NearDupDoc(doc_id: Long, text: String)

  /** A document's membership row for one LSH bucket. */
  final case class BandedDoc(bucket: String, doc_id: Long)

  /** A candidate near-duplicate pair, `d1 < d2`. */
  final case class CandPair(d1: Long, d2: Long)

  /** (band, bsig)-keyed membership: state = the doc ids stored in this
    * bucket (ListState, ≤ `maxBucket`); every NEW doc pairs with each
    * stored member plus the earlier new docs of its own micro-batch —
    * the streaming unrolling of the batch `a.bsig = b.bsig AND a.doc <
    * b.doc` self-join, so feeding a corpus in any batching yields the
    * batch candidate set (exact while no bucket overflows). */
  final class BandMembershipProcessor(maxBucket: Int,
                                      ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, BandedDoc, CandPair] {
    @transient private var members: org.apache.spark.sql.streaming.ListState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[Long]("bucketMembers",
        Encoders.scalaLong, ttl)
    override def handleInputRows(key: String, rows: Iterator[BandedDoc],
                                 timers: TimerValues): Iterator[CandPair] = {
      val stored = members.get().toArray
      // deterministic in-batch order (min doc id first) + idempotent
      // against same-batch re-delivery of one doc's bucket row
      val fresh = rows.map(_.doc_id).toArray.distinct.sorted
        .filterNot(stored.contains)
      if (fresh.isEmpty) return Iterator.empty
      val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
      val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
      var room = maxBucket - stored.length
      fresh.foreach { d =>
        stored.foreach(m => out += CandPair(math.min(m, d), math.max(m, d)))
        admitted.foreach(m => out += CandPair(math.min(m, d), math.max(m, d)))
        // over-cap arrivals still PAIR against members but are not stored:
        // state stays ≤ maxBucket under a boilerplate flood
        if (room > 0) { admitted += d; room -= 1 }
      }
      if (admitted.nonEmpty) members.appendList(admitted.toArray)
      out.iterator
    }
  }

  /** Pair-keyed once-only emitter: bands overlap (OR-amplification), so
    * the same (d1, d2) surfaces from several buckets — one boolean per
    * emitted pair keeps the output stream a SET, like the batch
    * `.distinct()`. */
  final class PairOnceProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, CandPair, CandPair] {
    @transient private var emitted: ValueState[Boolean] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      emitted = getHandle.getValueState[Boolean]("pairEmitted",
        Encoders.scalaBoolean, ttl)
    override def handleInputRows(key: String, rows: Iterator[CandPair],
                                 timers: TimerValues): Iterator[CandPair] = {
      if (emitted.exists()) Iterator.empty
      else { emitted.update(true); Iterator.single(rows.next()) }
    }
  }

  /** Candidate near-duplicate pairs over a document stream — the
    * continuous form of q34's banded-MinHash candidate generation, same
    * kernels, same banding parameters. Requires the RocksDB state store
    * provider (state API v2), like the other processors here. */
  def nearDupCandidateStream(docs: Dataset[NearDupDoc], n: Int = 3,
                             numHashes: Int = 18, bands: Int = 6,
                             maxBucket: Int = 1024,
                             ttl: TTLConfig = TTLConfig.NONE): Dataset[CandPair] = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    import docs.sparkSession.implicits._
    val banded: Dataset[BandedDoc] = docs.flatMap { d =>
      val sh = graft.ops.Dedup.shinglesFromText(d.text, n)
      if (sh.isEmpty) Iterator.empty
      else {
        val sig = graft.ops.Dedup.minhashSignature(
          scala.collection.immutable.ArraySeq.unsafeWrapArray(sh), numHashes)
        graft.ops.Dedup.bandSignatures(sig, bands).iterator.zipWithIndex
          .map { case (bsig, b) => BandedDoc(s"$b:$bsig", d.doc_id) }
      }
    }
    val cands = banded.groupByKey(_.bucket)
      .transformWithState(new BandMembershipProcessor(maxBucket, ttl),
        timeModeFor(ttl), OutputMode.Append())
    cands.groupByKey(p => p.d1 + ":" + p.d2)
      .transformWithState(new PairOnceProcessor(ttl),
        timeModeFor(ttl), OutputMode.Append())
  }

  /** One image (PPM payload) entering the perceptual near-dup gate. */
  final case class MediaDoc(media_id: Long, bytes: Array[Byte])

  /** A hashed image's membership row for one 8-bit pHash band. */
  final case class PhashBanded(bucket: String, media_id: Long, ph: Long)

  /** A stored band-bucket member: id + full hash (16 B — the payload
    * never enters state). */
  final case class PhashMember(media_id: Long, ph: Long)

  /** (band, byte)-keyed membership over the 8×8-bit pHash bands — the
    * image twin of [[BandMembershipProcessor]], with one structural
    * difference: members carry their full 64-bit hash, so candidate
    * pairs are Hamming-VERIFIED at emission (the batch operator's
    * `popcount(xor) ≤ maxHamming` filter) instead of estimated. The
    * emitted stream is therefore the batch q168 pair set itself, not a
    * candidate superset. Pigeonhole keeps the banding lossless for
    * maxHamming ≤ 7, exactly as in [[graft.ops.Multimodal.phashPairs]]. */
  final class PhashBandProcessor(maxBucket: Int, maxHamming: Int,
                                 ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, PhashBanded, CandPair] {
    @transient private var members: org.apache.spark.sql.streaming.ListState[PhashMember] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[PhashMember]("bucketMembers",
        Encoders.product[PhashMember], ttl)
    override def handleInputRows(key: String, rows: Iterator[PhashBanded],
                                 timers: TimerValues): Iterator[CandPair] = {
      val stored = members.get().toArray
      val storedIds = stored.map(_.media_id).toSet
      // deterministic in-batch order + idempotent against re-delivery
      // (one id always carries one hash: the hash is a pure function of
      // the immutable payload)
      val fresh = rows.map(r => PhashMember(r.media_id, r.ph)).toArray
        .distinctBy(_.media_id).sortBy(_.media_id)
        .filterNot(m => storedIds.contains(m.media_id))
      if (fresh.isEmpty) return Iterator.empty
      val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
      val admitted = scala.collection.mutable.ArrayBuffer.empty[PhashMember]
      def pair(a: PhashMember, b: PhashMember): Unit =
        if (java.lang.Long.bitCount(a.ph ^ b.ph) <= maxHamming)
          out += CandPair(math.min(a.media_id, b.media_id),
            math.max(a.media_id, b.media_id))
      var room = maxBucket - stored.length
      fresh.foreach { m =>
        stored.foreach(pair(_, m))
        admitted.foreach(pair(_, m))
        // over-cap arrivals still pair against members but are not
        // stored: state stays ≤ maxBucket under a re-encode flood
        if (room > 0) { admitted += m; room -= 1 }
      }
      if (admitted.nonEmpty) members.appendList(admitted.toArray)
      out.iterator
    }
  }

  /** Perceptual near-duplicate image pairs over a media stream — the
    * continuous form of q168's banded pHash self-join
    * ([[graft.ops.Multimodal.phashPairs]]): decode + hash in the
    * stateless map (pixels never enter state or shuffle — 8 rows of
    * ≤ 16 B cross per image), (band, byte)-keyed membership with
    * Hamming verification at emission, and a pair-ledger dedup across
    * the overlapping bands. Feeding a corpus in any batching yields the
    * batch pair set (exact while no bucket overflows); TTL bounds
    * retention to the dedup horizon. Requires the RocksDB state store
    * provider, like the other processors here. */
  def phashNearDupStream(media: Dataset[MediaDoc], maxHamming: Int = 6,
                         maxBucket: Int = 1024,
                         ttl: TTLConfig = TTLConfig.NONE): Dataset[CandPair] = {
    require(maxHamming <= 7,
      "8x8-bit banding is only a lossless candidate generator for maxHamming <= 7")
    import media.sparkSession.implicits._
    val banded: Dataset[PhashBanded] = media.flatMap { m =>
      graft.ops.Multimodal.phashPpm(m.bytes) match {
        case Some(h) => (0 until 8).iterator.map(b =>
          PhashBanded(s"$b:${(h >>> (b * 8)) & 0xFFL}", m.media_id, h))
        case None => Iterator.empty
      }
    }
    val verified = banded.groupByKey(_.bucket)
      .transformWithState(new PhashBandProcessor(maxBucket, maxHamming, ttl),
        timeModeFor(ttl), OutputMode.Append())
    verified.groupByKey(p => p.d1 + ":" + p.d2)
      .transformWithState(new PairOnceProcessor(ttl),
        timeModeFor(ttl), OutputMode.Append())
  }

  /** The full continuous curation chain — line dedup → doc reassembly →
    * corpus dedup (keep-first on the REBUILT content) → per-lang quota —
    * as ONE streaming query: four keyed state operators under a single
    * checkpoint. `pri` for the quota election is the doc_id, so in-order
    * feeding admits the first `quotaK` novel docs per language. */
  def curationPipelineStream(lines: Dataset[PageLine], quotaK: Int,
                             ttl: TTLConfig = TTLConfig.NONE): Dataset[QuotaAdmit] = {
    import lines.sparkSession.implicits._
    val verdicts = lines.groupByKey(_.line)
      .transformWithState(new LineVerdictProcessor(ttl),
        timeModeFor(ttl), OutputMode.Append())
    val rebuilt = verdicts.groupByKey(_.doc_id)
      .transformWithState(new DocReassembleProcessor,
        TimeMode.None(), OutputMode.Append())
    val admitted = incrementalDedupStream(
      rebuilt.map(d => SeedableDoc(
        java.security.MessageDigest.getInstance("MD5")
          .digest(d.text.getBytes("UTF-8")).map("%02x".format(_)).mkString
          + ":" + d.lang, d.doc_id, d.lang, is_seed = false)),
      dedupWithinStream = true, ttl)
    quotaCapStream(admitted.map(a => QuotaDoc(a.lang, a.doc_id, a.doc_id)),
      quotaK, ttl)
  }
}
