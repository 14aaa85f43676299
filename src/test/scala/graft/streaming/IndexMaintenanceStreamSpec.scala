package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

private[streaming] final case class Cdc(op: String, vec_id: Long,
                                        embedding: Seq[Double])

/** Streaming kNN-graph maintenance ([[IndexMaintenance]]): micro-batch
  * CDC applied through the q174/q175 verbs against versioned parquet
  * state. The verbs' recall/exactness gates live in
  * KnnGraphInsertSpec/KnnGraphDeleteSpec; THIS spec gates the
  * orchestration — stream-vs-batch-fold parity (bit-for-bit), atomic
  * versioned commits, checkpoint-replay idempotence, and
  * tombstone-freedom of the served state. Tiny deterministic corpus:
  * the contracts under test are structural, not statistical. */
class IndexMaintenanceStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val k = 3

  private def vec(i: Int): Seq[Double] =
    Seq.tabulate(8)(j => ((i * 31 + j * 7) % 97) / 10.0)

  private def corpusDf(ids: Seq[Int]): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
  }

  private def edges(df: DataFrame): Seq[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted

  private val baseIds = 0 until 40
  private lazy val base = corpusDf(baseIds).localCheckpoint()
  private lazy val g0 = graft.ops.Similarity
    .knnGraph(base, "vec_id", "embedding", k).localCheckpoint()

  // batch 0: pure inserts; batch 1: two deletes + more inserts (one insert,
  // id 100, is vec(3)'s exact twin — the d2=0 arrival case rides along)
  private val b1 = (100 to 104).map(i => Cdc("I", i.toLong, vec(i)))
  private val b2 = Seq(Cdc("D", 7L, Seq.empty), Cdc("D", 19L, Seq.empty)) ++
    (105 to 107).map(i => Cdc("I", i.toLong, vec(i)))

  /** The batch-side fold applyBatch promises: deletes against the
    * pre-batch state first, then inserts against the post-delete state. */
  private def fold(corpus: DataFrame, graph: DataFrame,
                   batch: Seq[Cdc]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val dels = batch.filter(_.op == "D").map(_.vec_id).sorted
    val ins = batch.filter(_.op == "I")
    val (c1, g1) =
      if (dels.isEmpty) (corpus, graph)
      else (corpus.where(!col("vec_id").isin(dels: _*)),
        graft.ops.Similarity.knnGraphDelete(graph, corpus, "vec_id",
          "embedding", dels, k))
    if (ins.isEmpty) (c1.localCheckpoint(), g1.localCheckpoint())
    else {
      val insDf = ins.map(c => (c.vec_id, c.embedding)).toDF("vec_id", "embedding")
      (c1.unionByName(insDf).localCheckpoint(),
        graft.ops.Similarity.knnGraphInsert(g1, c1, "vec_id", "embedding",
          insDf, "vec_id", "embedding", k).localCheckpoint())
    }
  }

  private lazy val foldFinal: (DataFrame, DataFrame) = {
    val s1 = fold(base, g0, b1)
    fold(s1._1, s1._2, b2)
  }

  test("stream equals the batch fold bit-for-bit (file source, two " +
    "AvailableNow incarnations, one checkpoint)") {
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("graft-idx-state").toString
    val src = java.nio.file.Files.createTempDirectory("graft-idx-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-idx-ckpt").toString
    IndexMaintenance.init(stateDir, base, g0)
    assert(IndexMaintenance.latestVersion(stateDir).contains(-1L))
    val schema = "op STRING, vec_id LONG, embedding ARRAY<DOUBLE>"
    Seq(b1, b2).foreach { b =>
      b.toDF().coalesce(1).write.mode("append").json(src)
      val q = IndexMaintenance.graphMaintenanceStream(
        spark.readStream.schema(schema).json(src), stateDir, k, ckpt)
      val done = q.awaitTermination(120000)
      q.stop()
      assert(done, "AvailableNow incarnation did not finish within 120 s")
    }
    assert(IndexMaintenance.latestVersion(stateDir).contains(1L))
    val (streamCorpus, streamGraph) = IndexMaintenance.readState(spark, stateDir)
    assert(edges(streamGraph) == edges(foldFinal._2),
      "streamed graph diverges from the batch fold")
    assert(streamCorpus.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      == foldFinal._1.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq)
    // GC keeps the committed version and its predecessor only
    val versions = Option(new java.io.File(stateDir).listFiles()).get
      .filter(f => f.isDirectory && f.getName.startsWith("v")).map(_.getName).sorted
    assert(versions.toSeq == Seq("v0", "v1"), versions.mkString(","))
  }

  test("checkpoint replay is idempotent: re-applying a committed batch id " +
    "leaves the state untouched") {
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("graft-idx-replay").toString
    IndexMaintenance.init(stateDir, base, g0)
    IndexMaintenance.applyBatch(b1.toDF(), 0L, stateDir, k)
    val after1 = edges(IndexMaintenance.readState(spark, stateDir)._2)
    // crash-after-commit replay: the SAME batch id arrives again
    IndexMaintenance.applyBatch(b1.toDF(), 0L, stateDir, k)
    assert(IndexMaintenance.latestVersion(stateDir).contains(0L))
    assert(edges(IndexMaintenance.readState(spark, stateDir)._2) == after1,
      "replayed batch mutated committed state")
    // and the next id still applies on top
    IndexMaintenance.applyBatch(b2.toDF(), 1L, stateDir, k)
    assert(edges(IndexMaintenance.readState(spark, stateDir)._2)
      == edges(foldFinal._2))
  }

  test("contract guards fail fast: re-seed of a live stateDir, unknown op, " +
    "insert of a live id (the checkpoint-reset double-apply signature), " +
    "delete of an absent id") {
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("graft-idx-guard").toString
    IndexMaintenance.init(stateDir, base, g0)
    intercept[IllegalArgumentException] {
      IndexMaintenance.init(stateDir, base, g0)
    }
    intercept[IllegalArgumentException] {
      IndexMaintenance.applyBatch(
        Seq(Cdc("U", 200L, vec(200))).toDF(), 0L, stateDir, k)
    }
    intercept[IllegalArgumentException] { // id 5 is live in the base corpus
      IndexMaintenance.applyBatch(
        Seq(Cdc("I", 5L, vec(5))).toDF(), 0L, stateDir, k)
    }
    intercept[IllegalArgumentException] { // id 999 was never inserted
      IndexMaintenance.applyBatch(
        Seq(Cdc("D", 999L, Seq.empty)).toDF(), 0L, stateDir, k)
    }
    // every rejected batch left the committed state untouched
    assert(IndexMaintenance.latestVersion(stateDir).contains(-1L))
  }

  test("serve over the maintained state: the beam walk on readState's " +
    "graph returns the exact top-k for live queries, including a " +
    "just-inserted node and the deleted ids' former neighbors") {
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("graft-idx-serve").toString
    IndexMaintenance.init(stateDir, base, g0)
    IndexMaintenance.applyBatch(b1.toDF(), 0L, stateDir, k)
    IndexMaintenance.applyBatch(b2.toDF(), 1L, stateDir, k)
    val (corpus, graph) = IndexMaintenance.readState(spark, stateDir)
    // queries: a base survivor, a batch-0 insert, a batch-1 insert
    val qids = Seq(5L, 102L, 106L)
    val served = graft.ops.Similarity.beamSearchAnnOnGraph(
      graph, corpus, "vec_id", "embedding", qids, k = 2)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    // exact oracle via brute integer d2 on the live corpus
    val vecs = corpus.select(col("vec_id").cast("long"),
        expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))"))
      .as[(Long, Array[Long])].collect().toMap
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    qids.foreach { q =>
      val qv = vecs(q)
      val top = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (d2(qv, v), id) }.sorted.take(2).map(_._2).toSet
      val got = served.getOrElse(q, Set.empty)
      val recall = got.intersect(top).size.toDouble / top.size
      assert(recall >= 0.5, s"query $q: served $got vs exact $top")
      assert(!got.contains(7L) && !got.contains(19L),
        s"query $q served a deleted id")
    }
    // the d2=0 twin pair (100 inserted, 3 in base) must find each other
    // in BOTH directions — a directional repair bug passes a one-way check
    val twins = graft.ops.Similarity.beamSearchAnnOnGraph(
      graph, corpus, "vec_id", "embedding", Seq(100L, 3L), k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(twins.get(100L).contains(3L),
      s"vec 100's exact twin (id 3, d2=0) must be its top-1: $twins")
    assert(twins.get(3L).contains(100L),
      s"vec 3's exact twin (id 100, d2=0) must be its top-1: $twins")
  }

  test("served state is tombstone-free and covers exactly the live corpus") {
    val (corpus, graph) = {
      import spark.implicits._
      val stateDir = java.nio.file.Files.createTempDirectory("graft-idx-tomb").toString
      IndexMaintenance.init(stateDir, base, g0)
      IndexMaintenance.applyBatch(b1.toDF(), 0L, stateDir, k)
      IndexMaintenance.applyBatch(b2.toDF(), 1L, stateDir, k)
      IndexMaintenance.readState(spark, stateDir)
    }
    val live = corpus.select("vec_id").collect().map(_.getLong(0)).toSet
    val expectedLive = (baseIds.map(_.toLong).toSet -- Set(7L, 19L)) ++
      (100 to 107).map(_.toLong)
    assert(live == expectedLive)
    val g = graph.collect()
    val nodes = g.map(_.getLong(0)).toSet
    val nbrs = g.map(_.getLong(2)).toSet
    assert(nodes == live, "graph node set must equal the live corpus")
    assert(!nbrs.contains(7L) && !nbrs.contains(19L),
      "deleted ids must not survive as neighbors")
    // every live node carries a full k-list (enough survivors exist)
    val perNode = g.groupBy(_.getLong(0)).map(_._2.length)
    assert(perNode.forall(_ == k))
  }
}
