package graft.streaming

import java.io.File
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Epoch-lease writer fencing for the versioned index state
  * ([[StateProtocol.acquireWriter]] / checkWriter): the single-writer
  * contract, ENFORCED. Before the lease, two maintenance streams
  * pointed at one stateDir would interleave pointer swaps and each
  * could GC the other's live bases — silent corruption in an otherwise
  * fail-loud protocol. With it, the superseded writer dies with a named
  * [[StateProtocol.FencedException]] at its next commit attempt and
  * committed state is untouched. */
class WriterFencingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val k = 3

  private def vec(i: Int): Seq[Double] =
    Seq.tabulate(8)(j => ((i * 37 + j * 11) % 89) / 10.0)

  private def corpusDf(ids: Seq[Int]): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
  }

  private lazy val base = corpusDf(0 until 30).localCheckpoint()
  private lazy val g0 = graft.ops.Similarity
    .knnGraph(base, "vec_id", "embedding", k).localCheckpoint()

  private def batchDf(b: Seq[Cdc]): DataFrame = {
    import spark.implicits._
    b.toDF()
  }

  private val b0 = (100 to 103).map(i => Cdc("I", i.toLong, vec(i)))
  private val b1 = Seq(Cdc("D", 5L, Seq.empty), Cdc("I", 104L, vec(104)))
  private val b2 = Seq(Cdc("I", 105L, vec(105)))

  private def freshState(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-fence-$tag")
      .toString
    IndexMaintenance.init(d, base, g0)
    d
  }

  private def corpusRows(c: DataFrame): Seq[(Long, Seq[Double])] =
    c.collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)

  test("two interleaved appliers on one stateDir: the superseded writer " +
    "fails fast with a named FencedException, committed state is intact, " +
    "and the new writer carries on") {
    val dir = freshState("interleave")
    val a = IndexMaintenance.acquireWriter(dir)
    IndexMaintenance.applyBatch(batchDf(b0), 0L, dir, k, lease = Some(a))
    assert(IndexMaintenance.latestVersion(dir).contains(0L))
    val expect = corpusRows(IndexMaintenance.readState(spark, dir)._1)
    // writer B takes over (a second maintenance stream misconfigured
    // onto the same stateDir) — A's epoch is now superseded
    val b = IndexMaintenance.acquireWriter(dir)
    val e = intercept[StateProtocol.FencedException] {
      IndexMaintenance.applyBatch(batchDf(b1), 1L, dir, k, lease = Some(a))
    }
    assert(e.getMessage.contains("fenced out"), e.getMessage)
    // A's failed attempt changed NOTHING: pointer, versions, content
    assert(IndexMaintenance.latestVersion(dir).contains(0L))
    assert(corpusRows(IndexMaintenance.readState(spark, dir)._1) == expect)
    // B — the live writer — applies the same logical batch fine
    IndexMaintenance.applyBatch(batchDf(b1), 1L, dir, k, lease = Some(b))
    assert(IndexMaintenance.latestVersion(dir).contains(1L))
    assert(IndexMaintenance.readState(spark, dir)._1
      .where(col("vec_id") === 5L).count() == 0)
  }

  test("a lease spans many batches, replay under a live lease stays a " +
    "silent no-op, and replay under a SUPERSEDED lease fails loudly " +
    "instead of silently skipping") {
    val dir = freshState("span")
    val a = IndexMaintenance.acquireWriter(dir)
    IndexMaintenance.applyBatch(batchDf(b0), 0L, dir, k, lease = Some(a))
    IndexMaintenance.applyBatch(batchDf(b1), 1L, dir, k, lease = Some(a))
    IndexMaintenance.applyBatch(batchDf(b2), 2L, dir, k, lease = Some(a))
    assert(IndexMaintenance.latestVersion(dir).contains(2L))
    // checkpoint replay with the live lease: idempotent skip, no error
    IndexMaintenance.applyBatch(batchDf(b1), 1L, dir, k, lease = Some(a))
    assert(IndexMaintenance.latestVersion(dir).contains(2L))
    IndexMaintenance.acquireWriter(dir) // fence A
    // even a would-be replay dies loudly: a fenced stream must stop,
    // not keep half-participating in the protocol
    intercept[StateProtocol.FencedException] {
      IndexMaintenance.applyBatch(batchDf(b1), 1L, dir, k, lease = Some(a))
    }
  }

  test("legacy mode (no lease) is unchanged, and an unleased writer is " +
    "not blocked by someone else's WRITER file — the lease binds only " +
    "those who hold one") {
    val dir = freshState("legacy")
    IndexMaintenance.acquireWriter(dir) // someone holds a lease
    // by-contract mode still works (the operator owns the discipline)
    IndexMaintenance.applyBatch(batchDf(b0), 0L, dir, k)
    assert(IndexMaintenance.latestVersion(dir).contains(0L))
  }

  test("acquire bumps the epoch monotonically and survives the protocol's " +
    "own commits (the WRITER file is not a version and not GC'd)") {
    val dir = freshState("epoch")
    val a = IndexMaintenance.acquireWriter(dir)
    IndexMaintenance.applyBatch(batchDf(b0), 0L, dir, k, lease = Some(a))
    IndexMaintenance.applyBatch(batchDf(b1), 1L, dir, k, lease = Some(a))
    IndexMaintenance.applyBatch(batchDf(b2), 2L, dir, k, lease = Some(a))
    // three commits with keepVersions=2 GC'd old versions, never WRITER
    assert(new File(dir, "WRITER").isFile)
    val b = IndexMaintenance.acquireWriter(dir)
    assert(b.epoch == a.epoch + 1, s"epochs ${a.epoch} -> ${b.epoch}")
    // and the whole thing works through the Hadoop FS backend too
    val fsDir = "file:" + java.nio.file.Files
      .createTempDirectory("graft-fence-fs").toString
    IndexMaintenance.init(fsDir, base, g0)
    val f1 = IndexMaintenance.acquireWriter(fsDir)
    IndexMaintenance.applyBatch(batchDf(b0), 0L, fsDir, k, lease = Some(f1))
    IndexMaintenance.acquireWriter(fsDir)
    intercept[StateProtocol.FencedException] {
      IndexMaintenance.applyBatch(batchDf(b1), 1L, fsDir, k, lease = Some(f1))
    }
    assert(IndexMaintenance.latestVersion(fsDir).contains(0L))
  }

  test("a crashed acquire's .WRITER.tmp.* orphan is reaped by the next " +
    "commit (never a live artifact once WRITER exists)") {
    val dir = freshState("reap")
    val a = IndexMaintenance.acquireWriter(dir)
    // simulate an acquire that died between staging and rename
    val orphan = new File(dir, ".WRITER.tmp.dead-crashed-acquire")
    java.nio.file.Files.writeString(orphan.toPath, "9999")
    assert(orphan.isFile)
    IndexMaintenance.applyBatch(batchDf(b0), 0L, dir, k, lease = Some(a))
    assert(!orphan.exists(),
      "commit's orphan pass must reap crashed-acquire writer temp files")
    assert(new File(dir, "WRITER").isFile, "the live WRITER survives the reap")
    // the lease still works after the reap — epoch state was untouched
    IndexMaintenance.applyBatch(batchDf(b1), 1L, dir, k, lease = Some(a))
    assert(IndexMaintenance.latestVersion(dir).contains(1L))
  }
}
