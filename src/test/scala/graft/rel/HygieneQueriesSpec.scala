package graft.rel

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.text.Mojibake

/** Round-9 corpus-hygiene wave: independent Scala replays of the declared
  * semantics (the DuckDB hash gate checks the oracle twin; these check the
  * SEMANTICS against a from-scratch reimplementation), kernel unit tests
  * for the mojibake repair, and the plan pins that carry each query to
  * corpus scale. */
class HygieneQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def docs(): Array[(Long, String, String)] =
    Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  // ---- q142 -----------------------------------------------------------------

  private def pageLines(id: Long, text: String): Vector[String] = {
    val headers = Vector("== boilerplate header alpha ==", "== boilerplate header beta ==",
      "== boilerplate header gamma ==", "== boilerplate header delta ==")
    val toks = text.split(" ", -1)
    val body = (0 to (toks.length - 1) / 12)
      .map(i => toks.slice(i * 12, i * 12 + 12).mkString(" ")).toVector
    (headers((id % 4).toInt) +: body) :+ s"-- all rights reserved v${id % 5} --"
  }

  test("q142: global keep-first line dedup replays sequentially; chrome " +
       "survives exactly once per variant") {
    val pages = docs().map { case (id, _, text) => (id, pageLines(id, text)) }
      .sortBy(_._1)
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = pages.map { case (id, ls) =>
      val kept = ls.filter(l => seen.add(l))
      (id, (ls.length.toLong, kept.length.toLong, md5hex(kept.mkString("\n"))))
    }.toMap
    val got = HygieneQueries.q142LineDedup(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expected)
    // corpus-wide: each of the 4 header / 5 footer variants survives exactly once
    val allKeptLines = {
      val s2 = scala.collection.mutable.Set.empty[String]
      pages.flatMap { case (_, ls) => ls.filter(l => s2.add(l)) }
    }
    assert(allKeptLines.count(_.startsWith("== boilerplate")) == 4)
    assert(allKeptLines.count(_.startsWith("-- all rights")) == 5)
    // and dedup actually bites: strictly fewer lines survive than exist
    assert(expected.values.map(_._2).sum < expected.values.map(_._1).sum)
  }

  test("q142 plan: keeper election is an aggregate + join-back — no " +
       "row_number window over the (skew-prone) line key") {
    val p = plan("q142_line_dedup")
    assert(!p.contains("windowspecdefinition"),
      s"line election must not sort per-line partitions:\n$p")
    assert(p.contains("Aggregate"), s"expected the min(struct) election:\n$p")
  }

  // ---- q143 -----------------------------------------------------------------

  test("q143: every Gopher rule replays from scratch, and the injected noise " +
       "actually flips rules at this SF") {
    def r4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    val stop = Set("the", "a", "to", "of", "and", "in", "on", "is")
    val expected = docs().map { case (id, _, text) =>
      val page = text +
        (if (id % 6 == 0) " #" * ((id % 4) + 1).toInt else "") +
        (if (id % 10 == 0) " 90210 90210 90210" else "")
      val tk = page.split(" ", -1)
      val n = tk.length.toLong
      val meanLen = r4(tk.map(_.length.toLong).sum.toDouble / n.toDouble)
      val symbolRatio = r4(tk.count(w => w == "#" || w == "...").toDouble / n.toDouble)
      val alphaRatio = r4(tk.count(_.exists(c => c >= 'a' && c <= 'z')).toDouble / n.toDouble)
      val nStop = tk.distinct.count(stop.contains).toLong
      val fW = if (n >= 50 && n <= 100000) 1 else 0
      val fM = if (meanLen >= 3.0 && meanLen <= 10.0) 1 else 0
      val fS = if (symbolRatio <= 0.1) 1 else 0
      val fA = if (alphaRatio >= 0.8) 1 else 0
      val fT = if (nStop >= 2) 1 else 0
      (id, (n, meanLen, symbolRatio, alphaRatio, nStop, fW, fM, fS, fA, fT,
        fW * fM * fS * fA * fT))
    }.toMap
    val got = HygieneQueries.q143GopherRules(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getInt(6), r.getInt(7), r.getInt(8),
        r.getInt(9), r.getInt(10), r.getInt(11)))).toMap
    assert(got == expected)
    // the rules are live, not vacuous: both verdicts occur, and at least
    // one rejection comes from the word-count rule alone (short docs)
    val keeps = got.values.map(_._11).toSet
    assert(keeps == Set(0, 1), "both keep and reject must occur at this SF")
    assert(got.values.exists(v => v._6 == 0), "some doc must fail the 50-word floor")
  }

  test("q143/q144 plan: pure projections — the only exchange is the " +
       "declared ORDER BY") {
    for (q <- Seq("q143_gopher_rules", "q144_mojibake_repair")) {
      val p = plan(q)
      val n = p.linesIterator.count(_.contains(") Exchange"))
      assert(n == 1, s"$q: expected exactly the final sort exchange, got $n:\n$p")
    }
  }

  // ---- q144 -----------------------------------------------------------------

  test("Mojibake kernel: corrupt/repair round-trips, healthy text untouched") {
    val healthy = "caf\u00e9 con leche v\u00e4rde"
    assert(Mojibake.corrupt(healthy) != healthy)
    assert(Mojibake.repair(Mojibake.corrupt(healthy)) == ((healthy, 1)))
    assert(Mojibake.repair(Mojibake.corruptN(healthy, 2)) == ((healthy, 2)))
    assert(Mojibake.repair(Mojibake.corruptN(healthy, 3)) == ((healthy, 3)))
    // healthy single-encoded text: latin-1 bytes are invalid UTF-8 -> no-op
    assert(Mojibake.repair(healthy) == ((healthy, 0)))
    // pure ASCII: corruption is the identity and repair must not touch it
    val ascii = "plain ascii text 123"
    assert(Mojibake.corrupt(ascii) == ascii)
    assert(Mojibake.repair(ascii) == ((ascii, 0)))
    // chars beyond latin-1 (CJK) are healthy Unicode -> no-op
    val cjk = "\u4f60\u597d world"
    assert(Mojibake.repair(cjk) == ((cjk, 0)))
  }

  test("q144: repaired text hash-matches the never-corrupted original on " +
       "every document; detected rounds equal the corruption schedule") {
    val expected = docs().map { case (id, _, text) =>
      val accented = text.replaceAll("\\btable\\b", "tabl\u00e9")
        .replaceAll("\\bvalue\\b", "v\u00e4lue")
      val hasAccent = accented != text
      val rounds =
        if (hasAccent && id % 9 == 0) 2L
        else if (hasAccent && id % 3 == 0) 1L else 0L
      (id, (md5hex(accented), rounds, if (rounds > 0) 1 else 0))
    }.toMap
    val got = HygieneQueries.q144MojibakeRepair(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getInt(3)))).toMap
    assert(got == expected)
    // the schedule actually exercises both depths at this SF
    assert(got.values.exists(_._2 == 1L) && got.values.exists(_._2 == 2L))
  }

  // ---- q145 -----------------------------------------------------------------

  test("q145: the diff replays from the corruption schedule and statuses " +
       "partition correctly") {
    val ds = docs()
    val expected = (ds.flatMap { case (id, src, _) =>
      if (id % 13 == 0) Some((id, src, "removed"))
      else if (id % 7 == 0) Some((id, src, "changed"))
      else None
    } ++ ds.collect { case (id, src, _) if id % 17 == 0 =>
      (id + 1000000L, src, "added")
    }).toSet
    val got = HygieneQueries.q145SnapshotDiff(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSet == expected)
    assert(got.map(_._1).distinct.length == got.length, "doc_id is unique in the diff")
    got.foreach {
      case (id, _, "added")   => assert(id >= 1000000L)
      case (id, _, "removed") => assert(id % 13 == 0)
      case (id, _, "changed") => assert(id % 7 == 0 && id % 13 != 0)
      case (id, _, other)     => fail(s"unexpected status $other for $id")
    }
  }

  // ---- q146 -----------------------------------------------------------------

  test("q146: calibration bins replay from a from-scratch scorer; buckets " +
       "partition the corpus and gaps reflect the (uncalibrated) probe") {
    def r4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    val rows = Tables.load(spark, dir, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray))
    val per = rows.map { case (id, label, emb) =>
      var s = 0.0
      var j = 0
      while (j < emb.length) { s += emb(j).toDouble * ((j % 7) - 3) / 10.0; j += 1 }
      val pred = 1.0 / (1.0 + math.exp(-s))
      val bucket = math.min(math.floor(pred * 10).toLong, 9L)
      (bucket, (label % 2).toLong, math.floor(pred * 1e6 + 0.5).toLong)
    }
    val expected = per.groupBy(_._1).map { case (b, xs) =>
      val n = xs.length.toLong
      val nPos = xs.map(_._2).sum
      val mean = r4(xs.map(_._3).sum.toDouble / n.toDouble / 1e6)
      val rate = r4(nPos.toDouble / n.toDouble)
      (b, (n, nPos, mean, rate, r4(math.abs(mean - rate))))
    }
    val got = HygieneQueries.q146CalibrationBins(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(got == expected)
    assert(got.values.map(_._1).sum == rows.length, "buckets partition the corpus")
  }

  // ---- q147 -----------------------------------------------------------------

  test("q147: coverage curve replays from scratch; blocklisted sources are " +
       "absent and the covers_half flag is monotone") {
    def r4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    val block = Set("src3", "src7", "src13")
    val bySrc = docs().filter(d => !block(d._2))
      .groupBy(_._2).map { case (src, ds) =>
        (src, ds.length.toLong, ds.map(_._3.split(" ", -1).length.toLong).sum)
      }.toSeq
    val total = bySrc.map(_._3).sum
    val ranked = bySrc.sortBy { case (src, _, nt) => (-nt, src) }
    var cum = 0L
    val expected = ranked.zipWithIndex.map { case ((src, nd, nt), i) =>
      cum += nt
      (i + 1L, (src, nd, nt, cum, r4(cum.toDouble / total.toDouble),
        if (cum * 2 >= total) 1 else 0))
    }.toMap
    val got = HygieneQueries.q147SourceCoverage(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getInt(6)))).toMap
    assert(got == expected)
    assert(got.values.forall(v => !block(v._1)), "blocklisted sources filtered")
    // covers_half is a monotone step: once on, never off
    val flags = got.toSeq.sortBy(_._1).map(_._2._6)
    assert(flags.zip(flags.tail).forall { case (a, b) => a <= b })
    assert(flags.last == 1)
  }

  test("q147 plan: the blocklist is a broadcast anti-join; windows run " +
       "only over the catalog-sized rollup") {
    val p = plan("q147_source_coverage")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"blocklist must be a broadcast anti-join:\n$p")
    // the rank/cumsum windows sit ABOVE the per-source aggregate, so their
    // input is the |sources| rollup, not the corpus: the aggregate must
    // appear between the scan and any window in the formatted tree
    val lines = p.linesIterator.toSeq
    val aggIdx = lines.indexWhere(_.contains("HashAggregate"))
    val winIdx = lines.indexWhere(_.contains("Window"))
    assert(aggIdx >= 0 && winIdx >= 0 && winIdx < aggIdx,
      s"window must consume the aggregate output (tree prints top-down):\n$p")
  }

  // ---- q145 -----------------------------------------------------------------

  test("q145 plan: one doc-keyed full-outer join; the text column never " +
       "reaches the join (hash projected before the exchange)") {
    val p = plan("q145_snapshot_diff")
    assert(p.contains("FullOuter"), s"expected a full-outer join:\n$p")
    // every exchange ships (doc_id, source, md5) projections — never raw text
    val blocks = p.split("\n\n")
    val exchangeBlocks = blocks.filter(_.linesIterator.nextOption()
      .exists(l => l.matches("""\(\d+\) Exchange.*""")))
    assert(exchangeBlocks.nonEmpty, s"expected detailed Exchange blocks:\n$p")
    exchangeBlocks.foreach(b => assert(!b.contains("text#"),
      s"an exchange ships the raw text column:\n$b"))
  }
}
