package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.streaming.Curation.SeedableDoc

/** Streaming incremental dedup (the curation arm of B28): batch-parity
  * with declared q85 on the real documents table, plus the keep-first
  * mode's cross-batch and same-batch-seed semantics. */
class CurationStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** Run a seeded-doc stream through the dedup gate; batches fed in
    * order, RocksDB provider scoped to the query. */
  private def run(batches: Seq[Seq[SeedableDoc]],
                  dedupWithinStream: Boolean): Seq[(Long, String, String)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[SeedableDoc]
      val name = s"curation_out_${System.nanoTime()}"
      val q = Curation.incrementalDedupStream(mem.toDS(), dedupWithinStream)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    } finally prevProvider match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming incremental dedup matches batch q85 on the documents table") {
    import spark.implicits._
    val docs = graft.rel.Tables.load(spark, SparkTestBase.Sf0001, "documents")
      .select(col("doc_id"), col("lang"), md5(lower(col("text"))).as("key"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val seeds = docs.filter(_._1 % 3 != 0)
      .map { case (id, lang, k) => SeedableDoc(k, id, lang, is_seed = true) }
    val stream = docs.filter(_._1 % 3 == 0).sortBy(_._1)
      .map { case (id, lang, k) => SeedableDoc(k, id, lang, is_seed = false) }
    // bootstrap batch = corpus seeds, then the arriving docs in two chunks
    val (s1, s2) = stream.splitAt(stream.length / 2)
    val got = run(Seq(seeds.toSeq, s1.toSeq, s2.toSeq), dedupWithinStream = false)
      .map { case (id, lang, k) => (id, lang, k) }.toSet
    val batch = graft.rel.ExtraQueries
      .q85IncrementalDedup(spark, SparkTestBase.Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == batch,
      s"stream/batch diverged: stream-only=${got -- batch}, batch-only=${batch -- got}")
    assert(batch.nonEmpty)
  }

  test("file-source stream (JSONL directory) drives the dedup gate end-to-end") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    // production shape: seed file lands first, then arriving batches; the
    // file source lists in arrival order under Trigger.AvailableNow
    val dir = java.nio.file.Files.createTempDirectory("graft-curation-src").toString
    Seq(SeedableDoc("kA", 100L, "en", is_seed = true)).toDF()
      .write.mode("append").json(dir)
    Seq(SeedableDoc("kA", 1L, "en", is_seed = false),
        SeedableDoc("kB", 2L, "de", is_seed = false)).toDF()
      .write.mode("append").json(dir)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = "key STRING, doc_id LONG, lang STRING, is_seed BOOLEAN"
      val name = s"curation_file_out_${System.nanoTime()}"
      val q = Curation.incrementalDedupStream(
          spark.readStream.schema(schema).json(dir).as[SeedableDoc])
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      // kA blocked by the seed (same processing batch under AvailableNow
      // still blocks: seeds are handled before stream rows per key)
      assert(got == Set((2L, "de", "kB")), s"got $got")
    } finally prevProvider match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("keep-first mode: cross-batch duplicates dropped, same-batch seed blocks, min doc_id wins") {
    val b1 = Seq(
      SeedableDoc("kA", 100L, "en", is_seed = true),  // corpus member
      SeedableDoc("kA", 1L, "en", is_seed = false),   // blocked by same-batch seed
      SeedableDoc("kB", 7L, "de", is_seed = false),   // novel, admitted
      SeedableDoc("kB", 3L, "de", is_seed = false))   // same batch: min doc_id wins
    val b2 = Seq(
      SeedableDoc("kB", 2L, "de", is_seed = false),   // cross-batch dup, dropped
      SeedableDoc("kC", 9L, "fr", is_seed = false))   // novel, admitted
    val got = run(Seq(b1, b2), dedupWithinStream = true).toSet
    assert(got == Set((3L, "de", "kB"), (9L, "fr", "kC")), s"got $got")
  }

  test("streaming dataset cards converge to the batch per-source aggregate (any micro-batch slicing)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.rel.Tables.load(spark, SparkTestBase.Sf0001, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
      .as[Curation.DocStat].collect().toSeq
    val expected = docs.groupBy(_.source).map { case (s, rows) =>
      s -> ((rows.size.toLong, rows.map(_.ntok).sum,
        rows.map(_.ntok).min, rows.map(_.ntok).max))
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Curation.DocStat]
      val name = s"card_out_${System.nanoTime()}"
      val q = Curation.sourceCardStream(mem.toDS()).writeStream
        .format("memory").queryName(name).outputMode("update").start()
      // deliberately uneven slicing: 1 doc, then ~half, then the rest
      val (a, rest) = docs.splitAt(1)
      val (b, c) = rest.splitAt(rest.size / 2)
      Seq(a, b, c).foreach { batch => mem.addData(batch: _*); q.processAllAvailable() }
      q.stop()
      val got = spark.table(name)
        .groupBy("source")
        .agg(max_by(struct("n_docs", "n_tokens", "min_tokens", "max_tokens"),
          col("n_docs")).as("s"))
        .select("source", "s.n_docs", "s.n_tokens", "s.min_tokens", "s.max_tokens")
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      assert(got == expected, s"streaming cards diverge from batch:\n$got\nvs\n$expected")
    } finally prevProvider match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Run a quota-doc stream through the cap gate (same harness shape as
    * the dedup runner above). */
  private def runQuota(batches: Seq[Seq[Curation.QuotaDoc]],
                       k: Int): Seq[(String, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Curation.QuotaDoc]
      val name = s"quota_out_${System.nanoTime()}"
      val q = Curation.quotaCapStream(mem.toDS(), k).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    } finally prevProvider match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming quota cap fed in priority order admits exactly the q138 kept " +
       "set with equal ranks") {
    val docs = graft.rel.Tables.load(spark, SparkTestBase.Sf0001, "documents")
      .select(col("doc_id"), col("source"), col("lang")).collect()
      .map(r => Curation.QuotaDoc(r.getString(1) + "/" + r.getString(2),
        r.getLong(0), (r.getLong(0) * 69069L) % 65536L))
    // one batch in global (pri, doc_id) order — any priority-respecting
    // slicing gives the same answer; one batch is the simplest such
    val got = runQuota(Seq(docs.sortBy(d => (d.pri, d.doc_id)).toSeq), k = 3).toSet
    val batch = graft.rel.TrainPrepQueries
      .q138QuotaSample(spark, SparkTestBase.Sf0001).collect()
      .map(r => (r.getString(1) + "/" + r.getString(2), r.getLong(0), r.getLong(4)))
      .toSet
    assert(got == batch,
      s"stream/batch diverged: stream-only=${got -- batch}, batch-only=${batch -- got}")
    assert(batch.nonEmpty)
  }

  test("streaming quota cap across micro-batches: arrival wins, cap never exceeded") {
    val b1 = Seq(
      Curation.QuotaDoc("a", 10L, 50L),  // admitted rk=1
      Curation.QuotaDoc("a", 11L, 10L),  // admitted rk=... sorts first in-batch
      Curation.QuotaDoc("b", 20L, 1L))   // admitted
    val b2 = Seq(
      Curation.QuotaDoc("a", 12L, 1L),   // best priority, but cell a is full
      Curation.QuotaDoc("b", 21L, 9L))   // admitted (cap 2 not yet reached)
    val got = runQuota(Seq(b1, b2), k = 2).toSet
    // batch 1, cell a: slice sorted by pri → 11 (rk 1), 10 (rk 2); full.
    assert(got == Set(("a", 11L, 1L), ("a", 10L, 2L),
      ("b", 20L, 1L), ("b", 21L, 2L)), s"got $got")
  }

  /** Run a page-line stream through the line-dedup gate (q142's
    * continuous form). */
  private def runLines(batches: Seq[Seq[Curation.LineIn]]): Seq[(Long, Int, String)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Curation.LineIn]
      val name = s"linededup_out_${System.nanoTime()}"
      val q = Curation.lineDedupStream(mem.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    } finally prevProvider match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming line dedup sliced in doc order admits exactly the batch " +
       "q142 kept line set") {
    import org.apache.spark.sql.functions.{col, expr, posexplode}
    val lines = graft.rel.Tables.load(spark, SparkTestBase.Sf0001, "documents")
      .select(col("doc_id"), expr(graft.rel.HygieneQueries.pageLinesExpr).as("ls"))
      .select(col("doc_id"), posexplode(col("ls")).as(Seq("pos", "line")))
      .collect()
      .map(r => Curation.LineIn(r.getString(2), r.getLong(0), r.getInt(1)))
      .sortBy(l => (l.doc_id, l.pos))
    // batch keeper election replayed: min (doc_id, pos) per distinct line
    val expected = lines.groupBy(_.line).map { case (_, ls) =>
      val f = ls.minBy(l => (l.doc_id, l.pos)); (f.doc_id, f.pos, f.line)
    }.toSet
    // three micro-batches split at doc_id boundaries — any doc-ordered
    // slicing preserves the global first-arrival = global-minimum identity
    val b = lines.partition(_.doc_id < 150)
    val c = b._2.partition(_.doc_id < 350)
    val got = runLines(Seq(b._1.toSeq, c._1.toSeq, c._2.toSeq)).toSet
    assert(got == expected,
      s"stream/batch diverged: stream-only=${got -- expected}, batch-only=${expected -- got}")
    // chrome pools: exactly 4 headers + 5 footers survive corpus-wide
    assert(got.count(_._3.startsWith("== boilerplate")) == 4)
    assert(got.count(_._3.startsWith("-- all rights")) == 5)
  }
}
