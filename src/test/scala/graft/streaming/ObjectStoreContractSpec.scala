package graft.streaming

import java.io.File
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Object-store CONTRACT tests: the versioned-state protocol and the
  * ModelStore publish path driven through [[TornFs]] — copy-then-delete
  * renames with an injectable torn window, and list-after-write-lagging
  * listings. These prove the documented degradations actually hold
  * rather than only being asserted in Scaladoc:
  *  - a crashed version publish fails the batch LOUDLY, the pointer
  *    stays, and the replay replaces the torn directory;
  *  - a torn/garbage pointer is a named error, never a partial read;
  *  - a lagging listing can NOT silently drop a delta from a chain fold
  *    (the chain file travels with the version), and GC under a lagging
  *    listing errs toward keeping too much, never dropping live chain
  *    members;
  *  - a crashed ModelStore publish degrades to the inline build, and a
  *    torn artifact found later is dropped and refit. */
class ObjectStoreContractSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestBase.spark
    TornFs.install(s.sparkContext.hadoopConfiguration)
    s
  }
  private val k = 3

  private def vec(i: Int): Seq[Double] =
    Seq.tabulate(8)(j => ((i * 29 + j * 13) % 83) / 10.0)

  private def corpusDf(ids: Seq[Int]): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
  }

  private lazy val base = corpusDf(0 until 30).localCheckpoint()
  private lazy val g0 = graft.ops.Similarity
    .knnGraph(base, "vec_id", "embedding", k).localCheckpoint()

  private val b0 = (100 to 103).map(i => Cdc("I", i.toLong, vec(i)))
  private val b1 = Seq(Cdc("D", 4L, Seq.empty)) ++
    (104 to 105).map(i => Cdc("I", i.toLong, vec(i)))
  private val b2 = Seq(Cdc("D", 100L, Seq.empty), Cdc("I", 106L, vec(106)))

  private def tornDir(tag: String): (String, String) = {
    val underlying = java.nio.file.Files
      .createTempDirectory(s"graft-torn-$tag").toString
    ("torn:" + underlying, underlying)
  }

  private def apply(dir: String, id: Long, b: Seq[Cdc], every: Int): Unit = {
    import spark.implicits._
    IndexMaintenance.applyBatch(b.toDF(), id, dir, k, compactEvery = every)
  }

  private def corpusRows(c: DataFrame): Seq[(Long, Seq[Double])] =
    c.collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)

  private def edges(g: DataFrame): Seq[(Long, Long, Long, Long)] =
    g.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq.sorted

  private def plainReference(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft-torn-ref-$tag").toString
    IndexMaintenance.init(d, base, g0)
    d
  }

  override def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    TornFs.reset()
    try super.withFixture(test) finally TornFs.reset()
  }

  test("the whole protocol — init, delta commits, compaction, chain GC, " +
    "pointer swaps, replay — survives COPY-RENAME semantics end to end, " +
    "byte-equal to a plain-path run") {
    val (torn, underlying) = tornDir("e2e")
    val ref = plainReference("e2e")
    IndexMaintenance.init(torn, base, g0)
    Seq(torn, ref).foreach { d =>
      apply(d, 0L, b0, 3); apply(d, 1L, b1, 3); apply(d, 2L, b2, 3)
      apply(d, 2L, b2, 3) // replay
    }
    val (tc, tg) = IndexMaintenance.readState(spark, torn)
    val (rc, rg) = IndexMaintenance.readState(spark, ref)
    assert(corpusRows(tc) == corpusRows(rc), "corpus diverged under torn fs")
    assert(edges(tg) == edges(rg), "graph diverged under torn fs")
    // compaction fired at v2 (chain v-1,v0,v1 reached compactEvery=3)
    assert(new File(underlying, "v2/corpus").isDirectory)
    // no staging residue: the copy-rename publish still cleaned up
    val resid = Option(new File(underlying).listFiles()).get
      .map(_.getName).filter(_.contains(".tmp"))
    assert(resid.isEmpty, s"staging residue: ${resid.mkString(",")}")
  }

  test("a crash MID-PUBLISH (half-copied version dir) fails the batch " +
    "loudly, leaves the pointer on the old version, and the replay " +
    "replaces the torn directory and commits — never adopts it") {
    val (torn, underlying) = tornDir("crash")
    IndexMaintenance.init(torn, base, g0)
    apply(torn, 0L, b0, 0)
    TornFs.crashWhenRenamingTo = Some(_ == "v1")
    intercept[java.io.IOException] { apply(torn, 1L, b1, 0) }
    // fail-loud posture: pointer untouched, torn dir observable
    assert(IndexMaintenance.latestVersion(torn).contains(0L))
    val tornV1 = new File(underlying, "v1")
    assert(tornV1.isDirectory, "the torn window must be observable")
    // a reader at the committed pointer is unaffected
    assert(corpusRows(IndexMaintenance.readState(spark, torn)._1).size == 34)
    // the replay (stream restart) replaces the torn dir and commits
    apply(torn, 1L, b1, 0)
    assert(IndexMaintenance.latestVersion(torn).contains(1L))
    val ref = plainReference("crashref")
    apply(ref, 0L, b0, 0); apply(ref, 1L, b1, 0)
    assert(corpusRows(IndexMaintenance.readState(spark, torn)._1) ==
      corpusRows(IndexMaintenance.readState(spark, ref)._1))
    assert(edges(IndexMaintenance.readState(spark, torn)._2) ==
      edges(IndexMaintenance.readState(spark, ref)._2))
  }

  test("a torn or garbage POINTER is a named error, never a partial " +
    "read — and a pointer at a vanished version names the disagreement") {
    val (torn, underlying) = tornDir("ptr")
    IndexMaintenance.init(torn, base, g0)
    // garbage pointer content (a torn single-file copy-rename window)
    java.nio.file.Files.write(new File(underlying, "LATEST").toPath,
      "-1x".getBytes)
    val e1 = intercept[RuntimeException] {
      IndexMaintenance.readState(spark, torn)
    }
    assert(e1.getMessage.contains("no committed index state"), e1.getMessage)
    // pointer at a version whose directory is gone
    java.nio.file.Files.write(new File(underlying, "LATEST").toPath,
      "7".getBytes)
    val e2 = intercept[RuntimeException] {
      IndexMaintenance.readState(spark, torn)
    }
    assert(e2.getMessage.contains("v7 is gone"), e2.getMessage)
  }

  test("a LAGGING LISTING cannot silently drop a delta from the chain " +
    "fold (the chain file travels with the version), and GC under lag " +
    "never deletes live chain members") {
    val (torn, underlying) = tornDir("lag")
    IndexMaintenance.init(torn, base, g0)
    apply(torn, 0L, b0, 10); apply(torn, 1L, b1, 10)
    val ref = plainReference("lagref")
    apply(ref, 0L, b0, 10); apply(ref, 1L, b1, 10)
    // the listing now omits delta v0 — a listing-discovered chain would
    // fold v-1 + v1 and silently lose batch 0's inserts
    TornFs.hideFromListing = Set("v0")
    val (c, g) = IndexMaintenance.readState(spark, torn)
    assert(corpusRows(c) ==
      corpusRows(IndexMaintenance.readState(spark, ref)._1),
      "fold must resolve through the chain file, not the lagging listing")
    assert(edges(g) == edges(IndexMaintenance.readState(spark, ref)._2))
    // a commit under the lagging listing: GC computes its keep window
    // from what it can SEE — the invisible v0 must survive (under-GC,
    // the safe direction), keeping the v1 chain resolvable
    apply(torn, 2L, b2, 10)
    TornFs.hideFromListing = Set.empty
    assert(new File(underlying, "v0").isDirectory,
      "GC under a lagging listing deleted a live chain member")
    apply(ref, 2L, b2, 10)
    assert(corpusRows(IndexMaintenance.readState(spark, torn)._1) ==
      corpusRows(IndexMaintenance.readState(spark, ref)._1))
  }

  test("the postings twin runs the same contract: copy-rename end to " +
    "end, torn publish replaced on replay, lagging-listing fold") {
    import spark.implicits._
    val (torn, underlying) = tornDir("pm")
    val docs = (0 until 30)
      .map(i => (i.toLong, s"spark join merge d$i word${i % 7}"))
      .toDF("doc_id", "text").localCheckpoint()
    PostingsMaintenance.init(torn, docs, "doc_id", "text")
    val i0 = (100 to 103).map(i => DocCdc("I", i.toLong, s"spark extra e$i"))
    val i1 = Seq(DocCdc("D", 5L, null), DocCdc("I", 104L, "merge tail"))
    // crash the v0 publish, then replay
    TornFs.crashWhenRenamingTo = Some(_ == "v0")
    intercept[java.io.IOException] {
      PostingsMaintenance.applyBatch(i0.toDF(), 0L, torn, compactEvery = 10)
    }
    assert(PostingsMaintenance.latestVersion(torn).contains(-1L))
    PostingsMaintenance.applyBatch(i0.toDF(), 0L, torn, compactEvery = 10)
    PostingsMaintenance.applyBatch(i1.toDF(), 1L, torn, compactEvery = 10)
    // lagging listing: hide v0, the chain fold must still see it
    TornFs.hideFromListing = Set("v0")
    val served = PostingsMaintenance.bm25Serve(spark, torn,
      Seq("spark", "join", "merge"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    TornFs.hideFromListing = Set.empty
    val after = (0 until 30).filterNot(_ == 5)
      .map(i => (i.toLong, s"spark join merge d$i word${i % 7}")) ++
      (100 to 103).map(i => (i.toLong, s"spark extra e$i")) :+
      (104L -> "merge tail")
    val refDocs = after.map { case (a, b) => (a.toString.toLong, b) }
      .toDF("doc_id", "text")
    val rebuilt = graft.ops.Lexical.bm25TopK(
      graft.ops.Lexical.buildPostings(refDocs, "doc_id", "text"),
      graft.ops.Lexical.buildStats(refDocs, "text"),
      Seq("spark", "join", "merge"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served == rebuilt)
    assert(new File(underlying, "v1/pdelta").isDirectory)
  }

  test("a crashed ModelStore publish degrades to the inline build, and " +
    "the torn artifact left behind is dropped and refit on next use") {
    import spark.implicits._
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft-torn-store").toString
    val saved = graft.ops.ModelStore.overrideDir
    graft.ops.ModelStore.overrideDir = Some("torn:" + storeDir)
    try {
      val docs = (0 until 25)
        .map(i => (i.toLong, s"spark join merge m$i w${i % 5}"))
        .toDF("doc_id", "text").localCheckpoint()
      def serve(): Seq[(Long, Double)] = {
        val (p, s) = graft.ops.Lexical.servedPostingsFor(
          spark, "torncase", docs, "doc_id", "text")
        graft.ops.Lexical.bm25TopK(p, s, Seq("spark", "merge"), 10)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      }
      val inline = graft.ops.Lexical.bm25TopK(
        graft.ops.Lexical.buildPostings(docs, "doc_id", "text"),
        graft.ops.Lexical.buildStats(docs, "text"), Seq("spark", "merge"), 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      // every artifact-dir publish in this store crashes torn: the
      // serve must degrade to the inline build and still be correct
      TornFs.crashWhenRenamingTo = Some(_.startsWith("lexical-"))
      assert(serve() == inline, "crashed publish must degrade to inline")
      // next use finds the torn artifact, drops it, refits, serves
      assert(serve() == inline, "torn artifact must be dropped and refit")
      // and by now the artifact is healthy: a third call reads it back
      assert(serve() == inline)
    } finally {
      graft.ops.ModelStore.overrideDir = saved
      TornFs.reset()
    }
  }
}
