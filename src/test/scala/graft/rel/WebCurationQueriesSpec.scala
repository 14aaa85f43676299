package graft.rel

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Round-9 web-ingestion wave: independent Scala replays of the declared
  * semantics (the DuckDB hash gate checks the oracle twin; these check
  * the SEMANTICS against from-scratch reimplementations that avoid the
  * engine's own regex/split machinery where feasible) plus the plan pins
  * that carry each query to crawl scale. */
class WebCurationQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  // ---- q151 -----------------------------------------------------------------

  /** From-scratch canonicalizer over the raw URL string — indexOf/substring
    * only, no regex, no splitting library. */
  private def canonicalize(url: String): String = {
    val noFrag = url.indexOf('#') match { case -1 => url; case i => url.substring(0, i) }
    val qPos = noFrag.indexOf('?')
    val (pathPart, query) =
      if (qPos == -1) (noFrag, "") else (noFrag.substring(0, qPos), noFrag.substring(qPos + 1))
    val afterScheme = pathPart.substring(8) // 'https://' in any casing
    val slash = afterScheme.indexOf('/')
    val hostRaw = if (slash == -1) afterScheme else afterScheme.substring(0, slash)
    val host = (hostRaw.indexOf(':') match {
      case -1 => hostRaw; case i => hostRaw.substring(0, i)
    }).toLowerCase
    var path = if (slash == -1) "" else afterScheme.substring(slash)
    while (path.endsWith("/")) path = path.dropRight(1)
    val params = query.split("&", -1).toSeq
      .filterNot(p => p.startsWith("utm_") || p.startsWith("ref="))
      .filter(_.nonEmpty).sorted
    "https://" + host + path + (if (params.isEmpty) "" else "?" + params.mkString("&"))
  }

  test("q151: canonical groups match a from-scratch indexOf/substring replay") {
    val raw = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), expr(WebCurationQueries.rawUrlExpr).as("url"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = raw.groupBy { case (_, u) => canonicalize(u) }.toSeq
      .map { case (c, rows) =>
        (c, rows.length.toLong, rows.map(_._2).distinct.length.toLong, rows.map(_._1).min) }
      .sortBy(_._1)
    val got = WebCurationQueries.q151UrlCanonicalDedup(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // canonicalization is doing real work: raw variants collapsed
    assert(got.map(_._2).sum == raw.length.toLong)
    assert(got.exists(_._3 > 1), "some canonical group must absorb multiple raw spellings")
    got.foreach { case (c, _, _, _) =>
      assert(c == c.toLowerCase.replaceAll("#.*", ""), s"canonical must be case-folded: $c")
      assert(!c.contains("utm_") && !c.contains("ref=") && !c.contains(":443"),
        s"tracking/port survived canonicalization: $c")
    }
  }

  test("q151 plan: keeper election is an aggregate, never a window over " +
       "the hot URL key") {
    val p = plan("q151_url_canonical_dedup")
    assert(!p.contains("windowspecdefinition"),
      s"q151 must not window over the canonical key:\n$p")
    assert(p.contains("partial"), s"expected map-side partial aggregation:\n$p")
  }

  // ---- q152 -----------------------------------------------------------------

  /** Textbook DP edit distance — validates the engines' levenshtein
    * semantics independently. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q152: representatives match a from-scratch blocked DP-Levenshtein replay") {
    val recs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), expr(WebCurationQueries.entityNameExpr).as("name"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byBlock = recs.groupBy(_._2.take(10))
    val expected = recs.map { case (id, name) =>
      val nbrs = byBlock(name.take(10)).filter { case (oid, oname) =>
        oid != id && lev(name, oname) <= 2 }.map(_._1)
      (id, name, (nbrs :+ id).min)
    }.toSeq.sortBy(_._1)
    val got = WebCurationQueries.q152FuzzyEntityDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("q152: clusters recover the synthesis identity exactly (one cluster " +
       "per canonical vendor, rep = its minimum doc_id)") {
    val got = WebCurationQueries.q152FuzzyEntityDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val byCanon = got.groupBy { case (id, _) => id % 25 }
    byCanon.foreach { case (c, members) =>
      val expectedRep = members.map(_._1).min
      members.foreach { case (id, rep) =>
        assert(rep == expectedRep, s"vendor $c: doc $id got rep $rep != $expectedRep") }
    }
    assert(byCanon.size == math.min(25, got.length))
  }

  test("q152 plan: candidate pairs come from an equi-join on the blocking " +
       "key — no cartesian, no nested-loop fallback") {
    val p = plan("q152_fuzzy_entity_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"blocking must keep the pair join equi-keyed:\n$p")
    assert(p.contains("blk"), s"expected the blk join key in the plan:\n$p")
  }

  // ---- q153 -----------------------------------------------------------------

  /** From-scratch char-scan extractor: element removal and tag stripping
    * by index scanning, entity decode and whitespace collapse by hand —
    * no regex anywhere, so the replay is independent of both engines'
    * regex machinery. */
  private def extract(html: String): String = {
    def dropElement(s: String, tag: String): String = {
      val sb = new StringBuilder
      var i = 0
      val open = s"<$tag>"; val close = s"</$tag>"
      while (i < s.length) {
        val j = s.indexOf(open, i)
        if (j == -1) { sb.append(s.substring(i)); i = s.length }
        else {
          sb.append(s.substring(i, j)).append(' ')
          val k = s.indexOf(close, j)
          i = if (k == -1) s.length else k + close.length
        }
      }
      sb.toString
    }
    val noElems = dropElement(dropElement(html, "script"), "style")
    val sb = new StringBuilder
    var inTag = false
    noElems.foreach {
      case '<' => inTag = true
      case '>' if inTag => inTag = false; sb.append(' ')
      case c if !inTag => sb.append(c)
      case _ => ()
    }
    val decoded = sb.toString
      .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
    decoded.split(" ", -1).filter(_.nonEmpty).mkString(" ")
  }

  test("q153: every extracted byte matches a regex-free char-scan replay") {
    val pages = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), expr(WebCurationQueries.htmlExpr).as("html"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = pages.map { case (id, html) =>
      val txt = extract(html)
      val t0 = html.indexOf("<title>") + 7
      val title = html.substring(t0, html.indexOf("</title>"))
        .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(txt.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (id, title, md5, txt.length.toLong)
    }.toSeq.sortBy(_._1)
    val got = WebCurationQueries.q153HtmlExtract(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected)
    // the chrome really is gone and the entity really decoded
    assert(expected.forall { case (_, title, _, _) => title.contains("& notes") })
  }

  test("q153 plan: pure projection — the only exchange is the declared " +
       "ORDER BY") {
    val p = plan("q153_html_extract")
    val n = p.linesIterator.count(_.contains(") Exchange"))
    assert(n == 1, s"expected exactly the final sort exchange, got $n:\n$p")
  }
}
