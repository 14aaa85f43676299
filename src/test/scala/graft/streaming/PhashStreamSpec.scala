package graft.streaming

import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.TTLConfig
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.streaming.Curation.{CandPair, MediaDoc}

/** Streaming pHash image near-dup (round-13: q168's streaming twin):
  * pair parity with the batch banded self-join on the q168 synthetic
  * scenes, Hamming verification at emission, cross-batch membership,
  * the bucket cap's flood bound, state accounting, and the TTL arm —
  * the NearDupStreamSpec battery over (band, byte) hash state. */
class PhashStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

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

  private def run(batches: Seq[Seq[MediaDoc]], maxBucket: Int = 1024,
                  ttl: TTLConfig = TTLConfig.NONE)
      : (Set[(Long, Long)], Seq[Long]) = withRocksDb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[MediaDoc]
    val name = s"phashdup_out_${System.nanoTime()}"
    val q = Curation.phashNearDupStream(mem.toDS(), maxBucket = maxBucket, ttl = ttl)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).toSeq
    q.stop()
    (spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      stateRows)
  }

  /** First 200 q168 scene/variant images: 64 scenes × ≤4 variants —
    * plenty of true near-dup groups, byte-identical to the batch op's
    * input (the shared synthesizer). */
  private lazy val fixtureMedia: Seq[(Long, Array[Byte])] =
    (0L until 200L).map(id => id -> graft.rel.ExtraQueries.sceneVariantPpm(id))

  private lazy val batchPairs: Set[(Long, Long)] = {
    import spark.implicits._
    val media = fixtureMedia.toDF("media_id", "ppm")
    graft.ops.Multimodal.phashPairs(media, "media_id", "ppm", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("streaming pairs over 3 micro-batches equal batch phashPairs " +
    "(Hamming-verified at emission, so the output IS the q168 pair set)") {
    val batches = fixtureMedia.grouped((fixtureMedia.size + 2) / 3)
      .map(_.map { case (id, b) => MediaDoc(id, b) }).toSeq
    val (got, _) = run(batches)
    assert(got == batchPairs,
      s"stream/batch diverged: stream-only=${got -- batchPairs}, " +
        s"batch-only=${batchPairs -- got}")
    assert(got.nonEmpty, "fixture must produce near-dup pairs")
  }

  test("cross-batch arrivals pair with stored members; re-delivery and " +
    "band overlap emit each pair once; far images never pair") {
    // scene 0 variant 0 and its brightness twin (variant 1 = +10
    // uniform -> DC-only shift, hash-identical); scene 3 is unrelated
    val a = MediaDoc(0L, graft.rel.ExtraQueries.sceneVariantPpm(0L))
    val b = MediaDoc(64L, graft.rel.ExtraQueries.sceneVariantPpm(64L))
    val far = MediaDoc(3L, graft.rel.ExtraQueries.sceneVariantPpm(3L))
    val (got, _) = run(Seq(Seq(a), Seq(far), Seq(b), Seq(b), Seq(a)))
    assert(got == Set((0L, 64L)), s"got $got")
  }

  test("bucket cap: a flooded bucket stores maxBucket members, arrivals " +
    "still pair against the stored ones; Hamming filter still applies") {
    // identical payloads -> identical hashes -> same 8 buckets, Hamming 0
    val bytes = graft.rel.ExtraQueries.sceneVariantPpm(0L)
    val b1 = (1L to 5L).map(MediaDoc(_, bytes))
    val (got, stateRows) = run(Seq(b1, Seq(MediaDoc(6L, bytes))), maxBucket = 2)
    val expected = Set((1L, 2L)) ++
      (3L to 6L).flatMap(d => Seq((1L, d), (2L, d))).toSet
    assert(got == expected, s"got $got expected $expected")
    // numRowsTotal counts KEYS: 8 occupied band buckets (identical
    // hash: one bucket per band, capped member list rides under the
    // key) + one per emitted pair
    assert(stateRows.sorted == Seq(8L, expected.size.toLong).sorted,
      s"state rows $stateRows")
  }

  test("state accounting on the fixture: membership keys == distinct " +
    "(band, byte) buckets, pair ledger == emitted pairs; replay grows neither") {
    val hashes = fixtureMedia.flatMap { case (id, b) =>
      graft.ops.Multimodal.phashPpm(b).map(id -> _) }
    val nBuckets = hashes.flatMap { case (_, h) =>
      (0 until 8).map(band => (band, (h >>> (band * 8)) & 0xFFL)) }
      .distinct.size.toLong
    val batch = fixtureMedia.map { case (id, b) => MediaDoc(id, b) }
    val (got1, rows1) = run(Seq(batch))
    assert(rows1.sorted == Seq(nBuckets, got1.size.toLong).sorted,
      s"state rows $rows1 != buckets $nBuckets + pairs ${got1.size}")
    val (got2, rows2) = run(Seq(batch, batch))
    assert(got2 == got1 && rows2.sorted == rows1.sorted,
      s"replay grew state or re-emitted: $rows2 vs $rows1")
  }

  test("TTL arm: an expired bucket forgets its members — the image-dedup " +
    "horizon is the retention horizon") {
    withRocksDb {
      import spark.implicits._
      val a = MediaDoc(0L, graft.rel.ExtraQueries.sceneVariantPpm(0L))
      val b = MediaDoc(64L, graft.rel.ExtraQueries.sceneVariantPpm(64L))
      def runInc(ttl: TTLConfig): Set[(Long, Long)] = {
        val out = TtlIncarnations.feed(spark,
          Seq(Seq(a), Seq(b)), waitBetweenMs = 1600,
          (media: org.apache.spark.sql.Dataset[MediaDoc]) =>
            Curation.phashNearDupStream(media, ttl = ttl))
        try spark.read.parquet(out).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        catch { case _: org.apache.spark.sql.AnalysisException => Set.empty }
      }
      val noTtl = runInc(TTLConfig.NONE)
      assert(noTtl == Set((0L, 64L)),
        s"without TTL the stored member must still pair: $noTtl")
      val withTtl = runInc(TTLConfig(Duration.ofMillis(800)))
      assert(withTtl.isEmpty,
        s"with TTL the expired bucket must forget image 0: $withTtl")
    }
  }
}
