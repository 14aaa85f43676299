package graft.streaming

import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.TTLConfig
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.Dedup
import graft.streaming.Curation.{CandPair, NearDupDoc}

/** Streaming banded-MinHash near-dup (the r11 verdict's one missing
  * streaming twin): candidate parity with batch q34's banded self-join on
  * the real documents table, exact-verification parity with q34's output
  * rows, cross-batch membership semantics, the bucket cap's flood bound,
  * state-size accounting, and the TTL retention arm. */
class NearDupStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** A deterministic near-identical text pair that provably shares ≥1
    * LSH bucket under the default (18, 6) banding — searched over tail
    * perturbations with the real kernels, so the cross-batch and TTL
    * tests can assert pairing without banding luck. */
  private lazy val nearPair: (String, String) = {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    def bucketsOf(t: String): Set[(Int, Long)] = {
      val sh = Dedup.shinglesFromText(t, 3)
      Dedup.bandSignatures(Dedup.minhashSignature(
        scala.collection.immutable.ArraySeq.unsafeWrapArray(sh), 18), 6)
        .zipWithIndex.map { case (s, b) => (b, s) }.toSet
    }
    val bb = bucketsOf(base)
    val variant = (0 to 50).iterator
      .map(i => base.replace("tok40", s"tok40x$i"))
      .find(v => bucketsOf(v).intersect(bb).nonEmpty)
    (base, variant.getOrElse(sys.error(
      "no tail perturbation shares a bucket — banding kernels changed?")))
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

  /** Feed batches through the candidate stream; returns (pairs, final
    * per-operator state rows). */
  private def run(batches: Seq[Seq[NearDupDoc]], maxBucket: Int = 1024,
                  ttl: TTLConfig = TTLConfig.NONE)
      : (Set[(Long, Long)], Seq[Long]) = withRocksDb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[NearDupDoc]
    val name = s"neardup_out_${System.nanoTime()}"
    val q = Curation.nearDupCandidateStream(mem.toDS(), maxBucket = maxBucket, ttl = ttl)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).toSeq
    q.stop()
    (spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      stateRows)
  }

  private def fixtureDocs: Array[(Long, String)] =
    graft.rel.Tables.load(spark, SparkTestBase.Sf0001, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

  /** Batch banding replayed locally with the SAME kernels: the bucket →
    * member-ids map. */
  private def localBuckets(docs: Array[(Long, String)])
      : Map[(Int, Long), Seq[Long]] = {
    val buckets = scala.collection.mutable.Map.empty[(Int, Long),
      scala.collection.mutable.ArrayBuffer[Long]]
    docs.foreach { case (id, text) =>
      val sh = Dedup.shinglesFromText(text, 3)
      if (sh.nonEmpty) {
        val sig = Dedup.minhashSignature(
          scala.collection.immutable.ArraySeq.unsafeWrapArray(sh), 18)
        Dedup.bandSignatures(sig, 6).zipWithIndex.foreach { case (bsig, b) =>
          buckets.getOrElseUpdate((b, bsig),
            scala.collection.mutable.ArrayBuffer.empty[Long]) += id
        }
      }
    }
    buckets.view.mapValues(_.toSeq).toMap
  }

  /** All within-bucket pairs — the ground-truth candidate set. */
  private def localCandidates(docs: Array[(Long, String)]): Set[(Long, Long)] =
    localBuckets(docs).values.flatMap { ids =>
      for (i <- ids.indices; j <- (i + 1) until ids.length)
        yield (math.min(ids(i), ids(j)), math.max(ids(i), ids(j)))
    }.toSet

  test("streaming candidates over 3 micro-batches equal the batch banded " +
    "self-join's candidate set; exact verification reproduces q34's pairs") {
    val docs = fixtureDocs
    val batches = docs.sortBy(_._1).grouped((docs.length + 2) / 3)
      .map(_.map { case (id, t) => NearDupDoc(id, t) }.toSeq).toSeq
    val (got, _) = run(batches)
    val expected = localCandidates(docs)
    assert(got == expected,
      s"stream/batch candidates diverged: stream-only=${got -- expected}, " +
        s"batch-only=${expected -- got}")
    assert(got.nonEmpty)

    // downstream exact verification (what a deployment does against its
    // doc store) must land exactly on declared q34's verified output
    val shingleSets = docs.map { case (id, t) =>
      id -> Dedup.shinglesFromText(t, 3).toSet }.toMap
    val verified = got.filter { case (a, b) =>
      val (sa, sb) = (shingleSets(a), shingleSets(b))
      val j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      j >= 0.8
    }
    val q34 = graft.rel.DataQueries.q34MinhashNearDup(spark, SparkTestBase.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified == q34,
      s"verified stream pairs != q34: stream-only=${verified -- q34}, " +
        s"q34-only=${q34 -- verified}")
  }

  test("cross-batch arrivals pair with stored members; re-delivery and " +
    "band overlap emit each pair once") {
    // two near-identical docs (one token changed far into the text keeps
    // most shingles shared → same bucket in ≥1 band) fed in SEPARATE
    // batches, then replayed
    val (base, variant) = nearPair
    val b1 = Seq(NearDupDoc(1L, base))
    val b2 = Seq(NearDupDoc(2L, variant))
    val (got, _) = run(Seq(b1, b2, b2, b1))
    assert(got == Set((1L, 2L)), s"got $got")
  }

  test("bucket cap: a flooded bucket stores maxBucket members, arrivals " +
    "still pair against the stored ones, over-cap member pairs are the " +
    "only loss") {
    val text = (1 to 30).map(i => s"w$i").mkString(" ") // identical text
    val b1 = (1L to 5L).map(NearDupDoc(_, text)).toSeq
    val (got, stateRows) = run(Seq(b1, Seq(NearDupDoc(6L, text))), maxBucket = 2)
    // stored members: 1, 2. Every later arrival pairs with both; pairs
    // among {3,4,5,6} (all over-cap) are the documented loss
    val expected = Set((1L, 2L)) ++
      (3L to 6L).flatMap(d => Seq((1L, d), (2L, d))).toSet
    assert(got == expected, s"got $got expected $expected")
    // state-row accounting: numRowsTotal counts KEYS — membership = 6
    // buckets (identical text: one bucket per band, each holding its
    // capped 2-id list as one keyed row); pair ledger = one key per
    // emitted pair
    assert(stateRows.sorted == Seq(6L, expected.size.toLong).sorted,
      s"state rows $stateRows")
  }

  test("state accounting on the fixture: membership keys == distinct " +
    "buckets, pair ledger == emitted pairs, and a duplicate replay grows neither") {
    val docs = fixtureDocs
    val batch = docs.map { case (id, t) => NearDupDoc(id, t) }.toSeq
    // numRowsTotal counts state KEYS: one row per occupied bucket (its
    // member list rides under that key), one per emitted pair
    val nBuckets = localBuckets(docs).size.toLong
    val (got1, rows1) = run(Seq(batch))
    assert(rows1.sorted == Seq(nBuckets, got1.size.toLong).sorted,
      s"state rows $rows1 != buckets $nBuckets + pairs ${got1.size}")
    // replaying the whole corpus adds no members and re-emits no pairs
    val (got2, rows2) = run(Seq(batch, batch))
    assert(got2 == got1 && rows2.sorted == rows1.sorted,
      s"replay grew state or re-emitted: $rows2 vs $rows1")
  }

  test("TTL arm: an expired bucket forgets its members — the near-dup " +
    "horizon is the retention horizon") {
    withRocksDb {
      import spark.implicits._
      val (base, variant) = nearPair
      def runInc(ttl: TTLConfig): Set[(Long, Long)] = {
        // shared ProcessingTime incarnation harness (see TtlIncarnations);
        // 1600 ms between incarnations > the 800 ms TTL horizon
        val out = TtlIncarnations.feed(spark,
          Seq(Seq(NearDupDoc(1L, base)), Seq(NearDupDoc(2L, variant))),
          waitBetweenMs = 1600,
          (docs: org.apache.spark.sql.Dataset[NearDupDoc]) =>
            Curation.nearDupCandidateStream(docs, ttl = ttl))
        // a pair-free run leaves a schema-less (or absent) sink dir
        try spark.read.parquet(out).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        catch { case _: org.apache.spark.sql.AnalysisException => Set.empty }
      }
      val noTtl = runInc(TTLConfig.NONE)
      assert(noTtl == Set((1L, 2L)),
        s"without TTL the stored member must still pair: $noTtl")
      val withTtl = runInc(TTLConfig(Duration.ofMillis(800)))
      assert(withTtl.isEmpty,
        s"with TTL the expired bucket must forget doc 1: $withTtl")
    }
  }
}
