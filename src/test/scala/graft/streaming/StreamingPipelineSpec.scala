package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.streaming.Curation.{PageLine, QuotaAdmit}

/** End-to-end streaming composition (the streaming analog of
  * `CurationPipelineSpec`): line dedup → doc reassembly → corpus dedup →
  * per-lang quota as ONE query — four keyed state operators (line
  * content, doc_id, content key, quota cell) under a single
  * checkpoint/state regime. The per-processor parity specs prove each
  * stage; this proves they COMPOSE: verdicts flow, completion detection
  * fires across stage boundaries, and the admitted set equals a
  * sequential in-memory replay of the same four-stage chain over the
  * documents fixture.
  */
class StreamingPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** Fixture pages: doc_id, lang, and q142's synthesized line list
    * (boilerplate header + 12-word chunks + rights footer) — the line
    * population with real cross-doc duplicates. */
  private def pages(maxDocs: Int): Seq[(Long, String, Seq[String])] =
    graft.rel.Tables.load(spark, SparkTestBase.Sf0001, "documents")
      .where(col("doc_id") < maxDocs)
      .select(col("doc_id"), col("lang"),
        expr(graft.rel.HygieneQueries.pageLinesExpr).as("lines"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
      .sortBy(_._1).toSeq

  /** Sequential reference: the same four stages replayed in doc_id order. */
  private def reference(ps: Seq[(Long, String, Seq[String])],
                        quotaK: Int): Seq[(String, Long, Long)] = {
    val seenLine = scala.collection.mutable.Set.empty[String]
    val seenKey = scala.collection.mutable.Set.empty[String]
    val admittedPerLang = scala.collection.mutable.Map.empty[String, Long]
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    for ((docId, lang, lines) <- ps) {
      val kept = lines.filter(l => seenLine.add(l))
      val text = kept.mkString("\n")
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString + ":" + lang
      if (seenKey.add(key)) {
        val c = admittedPerLang.getOrElse(lang, 0L)
        if (c < quotaK) {
          admittedPerLang(lang) = c + 1
          out += ((lang, docId, c + 1))
        }
      }
    }
    out.toSeq
  }

  test("four-stage curation chain in one query matches the sequential replay " +
       "over the documents fixture (3 doc-ordered batches)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ps = pages(maxDocs = 120)
    assert(ps.nonEmpty)
    val toLines: Seq[(Long, String, Seq[String])] => Seq[PageLine] = docs =>
      docs.flatMap { case (id, lang, ls) =>
        ls.zipWithIndex.map { case (l, p) => PageLine(l, id, p, lang, ls.length) }
      }
    // batches split on doc boundaries in doc_id order — every page's lines
    // share a batch, so completion (and thus quota arrival order) tracks
    // doc order and the sequential reference is the unique answer
    val third = ps.length / 3
    val batches = Seq(ps.take(third), ps.slice(third, 2 * third), ps.drop(2 * third))
      .map(toLines)

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[PageLine]
      val name = s"pipeline_out_${System.nanoTime()}"
      val q = Curation.curationPipelineStream(mem.toDS(), quotaK = 5)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      // plan pin: all four keyed stages must survive as FOUR distinct
      // TransformWithState operators (each with its own state store) —
      // a refactor that silently fuses or drops a stage fails here
      val plan = spark.streams.get(q.id)
        .asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      val nTws = "TransformWithState".r.findAllIn(plan).length
      assert(nTws >= 4, s"expected 4 TransformWithState operators, plan has $nTws:\n" +
        plan.take(800))
      q.stop()
      val got = spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = reference(ps, quotaK = 5).toSet
      assert(got == want,
        s"chain diverged: extra=${got diff want} missing=${want diff got}")
      // the quota stage really gated (some lang hit its cap) and the dedup
      // stages really dropped (fewer admissions than docs)
      assert(got.size < ps.length)
      assert(got.groupBy(_._1).values.exists(_.size == 5))
    } finally prevProvider match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
