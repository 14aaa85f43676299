package graft.streaming

import java.io.File
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

private[streaming] final case class DocCdc(op: String, doc_id: Long,
                                           text: String)

/** Incremental BM25 posting maintenance ([[PostingsMaintenance]]) — the
  * lexical twin of the graph index's CDC path, on the same
  * [[StateProtocol]] seam. Oracle throughout: a FROM-SCRATCH
  * build+serve over the equivalent resolved corpus (the q104/q178
  * arithmetic) — maintained state must be indistinguishable from a
  * rebuild, bit for bit, through every mode: full rewrite, delta chain,
  * compaction, delete-then-reinsert, replay, fencing, streaming. */
class PostingsMaintenanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def text(i: Int): String = {
    val words = Seq("spark", "join", "merge", "scan", "shuffle", "index",
      "plan", "agg")
    (0 until (3 + i % 5)).map(j => words((i * 7 + j * 3) % words.length))
      .mkString(" ")
  }

  private def docsDf(ids: Seq[Int]): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, text(i))).toDF("doc_id", "text")
  }

  private lazy val base = docsDf(0 until 40).localCheckpoint()

  private val b0 = (100 to 104).map(i => DocCdc("I", i.toLong, text(i)))
  private val b1 = Seq(DocCdc("D", 7L, null), DocCdc("D", 19L, null)) ++
    (105 to 107).map(i => DocCdc("I", i.toLong, text(i)))
  private val b2 = Seq(DocCdc("D", 101L, null), DocCdc("I", 108L, text(108)))

  private def freshState(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-pm-$tag").toString
    PostingsMaintenance.init(d, base, "doc_id", "text")
    d
  }

  private def apply(dir: String, id: Long, b: Seq[DocCdc], every: Int): Unit = {
    import spark.implicits._
    PostingsMaintenance.applyBatch(b.toDF(), id, dir, compactEvery = every)
  }

  private val terms = Seq("spark", "join", "merge")

  private def serve(dir: String): Seq[(Long, Double)] =
    PostingsMaintenance.bm25Serve(spark, dir, terms, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  /** The from-scratch oracle: inline build + q104 scorer over `docs`. */
  private def rebuilt(docs: DataFrame): Seq[(Long, Double)] =
    graft.ops.Lexical.bm25TopK(
      graft.ops.Lexical.buildPostings(docs, "doc_id", "text"),
      graft.ops.Lexical.buildStats(docs, "text"), terms, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  /** The corpus equivalent of the CDC sequence b0, b1, b2. */
  private lazy val afterAll: DataFrame =
    docsDf((0 until 40).filterNot(Set(7, 19)) ++
      (100 to 108).filterNot(_ == 101))

  private def postingRows(p: DataFrame): Set[(Long, String, Long, Double, Double)] =
    p.select(col("tb").cast("long"), col("term"), col("doc_id"),
      col("tf"), col("dl")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSet

  private def versionDirs(dir: String): Seq[String] =
    Option(new File(dir).listFiles()).get
      .filter(f => f.isDirectory && f.getName.startsWith("v") &&
        !f.getName.contains(".tmp")).map(_.getName).toSeq.sorted

  private def payload(dir: String, v: String): String = {
    val d = new File(dir, v)
    val has = Seq("postings", "pdelta").filter(s => new File(d, s).isDirectory)
    assert(has.size == 1, s"$v carries ${has.mkString("+")}")
    has.head
  }

  test("delta mode equals full mode equals a from-scratch rebuild through " +
    "insert+delete batches: postings set, stats, and served scores — and " +
    "the on-disk layout is base + cdelta chain with the base GC-kept") {
    val full = freshState("full"); val dlog = freshState("delta")
    Seq(full -> 0, dlog -> 10).foreach { case (d, m) =>
      apply(d, 0L, b0, m); apply(d, 1L, b1, m)
    }
    val after01 = docsDf((0 until 40).filterNot(Set(7, 19)) ++ (100 to 107))
    val (fp, fs) = PostingsMaintenance.readPostings(spark, full)
    val (dp, ds) = PostingsMaintenance.readPostings(spark, dlog)
    assert(postingRows(dp) == postingRows(fp), "postings diverged")
    assert(postingRows(fp) == postingRows(
      graft.ops.Lexical.buildPostings(after01, "doc_id", "text")),
      "maintained postings diverged from a rebuild")
    val fStats = fs.collect().head; val dStats = ds.collect().head
    assert(fStats.getDouble(0) == dStats.getDouble(0))
    assert(fStats.getDouble(1) == dStats.getDouble(1))
    // avgdl must be BIT-identical to a from-scratch avg — the additive
    // (n_docs, sum_dl) fold exists exactly for this
    val scratch = graft.ops.Lexical.buildStats(after01, "text")
      .collect().head
    assert(dStats.getDouble(0) == scratch.getDouble(0))
    assert(dStats.getDouble(1) == scratch.getDouble(1))
    assert(serve(full) == serve(dlog))
    assert(serve(dlog) == rebuilt(after01))
    assert(payload(dlog, "v0") == "pdelta")
    assert(payload(dlog, "v1") == "pdelta")
    assert(versionDirs(dlog) == Seq("v-1", "v0", "v1"),
      "delta chain must keep its base alive past the count window")
  }

  test("compaction on schedule: chain folds into a fresh base, parity " +
    "with full mode and with a rebuild holds across it, GC advances") {
    val dlog = freshState("compact")
    apply(dlog, 0L, b0, 2); apply(dlog, 1L, b1, 2); apply(dlog, 2L, b2, 2)
    assert(payload(dlog, "v1") == "postings", "v1 must be the compaction")
    assert(payload(dlog, "v2") == "pdelta")
    assert(versionDirs(dlog) == Seq("v1", "v2"))
    assert(serve(dlog) == rebuilt(afterAll))
  }

  test("delete-then-reinsert across delta batches serves the REINSERTED " +
    "text's postings (winning-version join, not a stale pdelta row)") {
    val dlog = freshState("reins")
    val t1 = "spark spark merge"; val t2 = "join index plan"
    apply(dlog, 0L, Seq(DocCdc("I", 500L, t1)), 10)
    apply(dlog, 1L, Seq(DocCdc("D", 500L, null)), 10)
    apply(dlog, 2L, Seq(DocCdc("I", 500L, t2)), 10)
    val (p, _) = PostingsMaintenance.readPostings(spark, dlog)
    val doc500 = p.where(col("doc_id") === 500L)
      .select("term", "tf").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(doc500 == Map("join" -> 1.0, "index" -> 1.0, "plan" -> 1.0),
      s"doc 500 must serve the reinserted text's postings, got $doc500")
  }

  test("replay is a no-op, contract breaches fail fast with state intact " +
    "(bad op, duplicate insert, delete-of-absent, insert-of-live)") {
    import spark.implicits._
    val dlog = freshState("contract")
    apply(dlog, 0L, b0, 10)
    val before = serve(dlog)
    apply(dlog, 0L, b0, 10) // replay
    assert(PostingsMaintenance.latestVersion(dlog).contains(0L))
    assert(serve(dlog) == before)
    intercept[IllegalArgumentException] {
      apply(dlog, 1L, Seq(DocCdc("U", 9L, "x")), 10)
    }
    intercept[IllegalArgumentException] {
      apply(dlog, 1L, Seq(DocCdc("I", 600L, "a"), DocCdc("I", 600L, "b")), 10)
    }
    intercept[IllegalArgumentException] {
      apply(dlog, 1L, Seq(DocCdc("D", 9999L, null)), 10)
    }
    intercept[IllegalArgumentException] {
      apply(dlog, 1L, Seq(DocCdc("I", 5L, "already live")), 10)
    }
    // the contract is enforced on BOTH op kinds: duplicate delete ids
    // are upstream-compaction's job, not silently-tolerated tombstone
    // duplication in the delta log
    intercept[IllegalArgumentException] {
      apply(dlog, 1L, Seq(DocCdc("D", 5L, null), DocCdc("D", 5L, null)), 10)
    }
    assert(PostingsMaintenance.latestVersion(dlog).contains(0L),
      "rejected batches must leave committed state untouched")
    assert(serve(dlog) == before)
  }

  test("writer fencing is wired through the postings path: the superseded " +
    "writer dies loudly, state intact, the new writer carries on") {
    import spark.implicits._
    val dlog = freshState("fence")
    val a = PostingsMaintenance.acquireWriter(dlog)
    PostingsMaintenance.applyBatch(b0.toDF(), 0L, dlog, lease = Some(a))
    val b = PostingsMaintenance.acquireWriter(dlog)
    intercept[StateProtocol.FencedException] {
      PostingsMaintenance.applyBatch(b1.toDF(), 1L, dlog, lease = Some(a))
    }
    assert(PostingsMaintenance.latestVersion(dlog).contains(0L))
    PostingsMaintenance.applyBatch(b1.toDF(), 1L, dlog, lease = Some(b))
    assert(PostingsMaintenance.latestVersion(dlog).contains(1L))
  }

  test("the serve plan keeps the listing-level term-bucket prune on the " +
    "BASE scan while resolving through a delta chain") {
    val dlog = freshState("prune")
    apply(dlog, 0L, b0, 10); apply(dlog, 1L, b1, 10)
    val served = PostingsMaintenance.bm25Serve(spark, dlog, terms, 20)
    val phys = served.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = phys.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString("\n")
    assert(pf.contains("tb"),
      s"term-bucket partition filter must reach the base postings scan:\n$pf")
    assert(!phys.contains("explode"), "serve plan re-tokenizes the corpus")
  }

  test("streaming end-to-end: postingsMaintenanceStream over a file " +
    "source, AvailableNow incarnations, one checkpoint — equals a " +
    "rebuild, and a restart replays nothing") {
    import spark.implicits._
    val dlog = freshState("stream")
    val src = java.nio.file.Files.createTempDirectory("graft-pm-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pm-ckpt").toString
    val schema = "op STRING, doc_id LONG, text STRING"
    Seq(b0, b1).foreach { b =>
      b.toDF().coalesce(1).write.mode("append").json(src)
      val q = PostingsMaintenance.postingsMaintenanceStream(
        spark.readStream.schema(schema).json(src), dlog, ckpt,
        compactEvery = 10)
      assert(q.awaitTermination(120000), "incarnation did not finish in 120 s")
      q.stop()
    }
    val after01 = docsDf((0 until 40).filterNot(Set(7, 19)) ++ (100 to 107))
    assert(serve(dlog) == rebuilt(after01))
    assert(PostingsMaintenance.latestVersion(dlog).contains(1L))
  }
}
